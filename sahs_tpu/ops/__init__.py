from . import encoding, grid, losses, rays, rendering, sampling  # noqa: F401
