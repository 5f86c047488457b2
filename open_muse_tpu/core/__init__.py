from .configuration import BaseConfig, ConfigMixin, register_to_config
from .modeling import ModelMixin
from .convert import convert_torch_state_dict, load_torch_state_dict

__all__ = [
    "BaseConfig",
    "ConfigMixin",
    "ModelMixin",
    "register_to_config",
    "convert_torch_state_dict",
    "load_torch_state_dict",
]
