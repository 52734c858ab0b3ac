from .denoiser import Paella, count_params, init_params
from .noise import add_noise, get_loss_weight

__all__ = ["Paella", "count_params", "init_params", "add_noise", "get_loss_weight"]
