from .nerface import NerfaceDataset  # noqa: F401
from .audio import AudioDataset  # noqa: F401
from .synthetic import SyntheticFaceDataset, write_synthetic_dataset  # noqa: F401
