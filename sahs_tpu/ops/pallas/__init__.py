from . import field_mlp  # noqa: F401
