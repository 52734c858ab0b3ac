from .torch_import import (
    convert_paella,
    convert_vqgan,
    expected_paella_keys,
    load_torch_state_dict,
)

__all__ = [
    "convert_paella",
    "convert_vqgan",
    "expected_paella_keys",
    "load_torch_state_dict",
]
