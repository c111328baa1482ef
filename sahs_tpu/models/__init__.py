from . import fields, nerface  # noqa: F401
