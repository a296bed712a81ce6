from decnet_tpu.data.datasets import get_dataset, StereoDataset
from decnet_tpu.data.loader import DataLoader, collate
from decnet_tpu.data import synthetic as _synthetic  # registers "synthetic"
