from .loader import (
    SampleFilter,
    SyntheticDataset,
    WebDatasetLoader,
    decode_image,
    iter_tar_samples,
    random_crop,
    resize_shorter_side,
    write_tar_shard,
)

__all__ = [
    "SampleFilter",
    "SyntheticDataset",
    "WebDatasetLoader",
    "decode_image",
    "iter_tar_samples",
    "random_crop",
    "resize_shorter_side",
    "write_tar_shard",
]

from .prefetch import background_iterator, prefetch_to_device  # noqa: E402

__all__ += ["background_iterator", "prefetch_to_device"]
