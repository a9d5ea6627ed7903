from .core import Config, apply_overrides, load_config, parse_override
from .registry import (
    BACKBONES,
    DATASETS,
    HEADS,
    LOSSES,
    MATCHERS,
    MODELS,
    PIPELINES,
    Registry,
    build,
)

__all__ = [
    "Config",
    "apply_overrides",
    "load_config",
    "parse_override",
    "Registry",
    "build",
    "MODELS",
    "HEADS",
    "BACKBONES",
    "LOSSES",
    "MATCHERS",
    "DATASETS",
    "PIPELINES",
]
