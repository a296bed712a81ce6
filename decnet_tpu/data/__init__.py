from decnet_tpu.data.datasets import get_dataset, StereoDataset
from decnet_tpu.data.loader import DataLoader, collate
