from ddmi_tpu.data.image_folder import ImageFolderDataset
from ddmi_tpu.data.synthetic import SyntheticImages

__all__ = ["ImageFolderDataset", "SyntheticImages"]
