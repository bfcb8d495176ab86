from distillclip_tpu.data.datamodule import MainDataModule
from distillclip_tpu.data.loader import DataLoader, MapDataset
from distillclip_tpu.data.tokenizer import HashTokenizer, SimpleTokenizer, build_tokenizer
from distillclip_tpu.data.transforms import (
    IMAGE_MEAN,
    IMAGE_STD,
    RandAugment,
    eval_image_transform,
    train_image_transform,
)

__all__ = [
    "DataLoader",
    "HashTokenizer",
    "IMAGE_MEAN",
    "IMAGE_STD",
    "MainDataModule",
    "MapDataset",
    "RandAugment",
    "SimpleTokenizer",
    "build_tokenizer",
    "eval_image_transform",
    "train_image_transform",
]
