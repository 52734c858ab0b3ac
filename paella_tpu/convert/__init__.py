from .torch_export import export_paella, export_vqgan
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
    "export_paella",
    "export_vqgan",
    "load_torch_state_dict",
]
