from voxe_tpu.data.dataset import PosedImagesDataset  # noqa: F401
