from disvae_tpu.data.datasets import (ArrayDataset, DataLoader, DATASETS,
                                      get_background, get_dataloaders,
                                      get_dataset, get_img_size)

__all__ = ["ArrayDataset", "DataLoader", "DATASETS", "get_background",
           "get_dataloaders", "get_dataset", "get_img_size"]
