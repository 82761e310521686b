from .registry import register, resolve_path, REGISTRY
from .yaml_config import load_config, parse_arguments

__all__ = ["register", "resolve_path", "REGISTRY", "load_config", "parse_arguments"]
