from .denoiser import Paella, count_params, init_params
from .layout import merge_skip_params, split_skip_params
from .noise import add_noise, get_loss_weight

__all__ = [
    "Paella",
    "count_params",
    "init_params",
    "add_noise",
    "get_loss_weight",
    "merge_skip_params",
    "split_skip_params",
]
