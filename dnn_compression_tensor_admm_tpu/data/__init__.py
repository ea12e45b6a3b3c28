"""Data pipelines.

Reference equivalents: datasets.py (CIFAR/ImageNet/MNIST loaders, two
augmentation paths), samplers.py (repeated augmentation).

TPU-first design for CIFAR-scale sets: the entire dataset is resident in
HBM (CIFAR-10 train is ~150 MB) and batch sampling + augmentation
(pad-crop, flip, normalize, mixup/cutmix) run *inside* the jitted train
step from a PRNG key — zero host<->device traffic per step, no input
pipeline to race against the MXU. ImageNet-scale data streams through
the host pipeline (native C++ loader) instead.
"""

from .datasets import load_dataset, DatasetInfo, CIFAR10_MEAN, CIFAR10_STD
from .device_pipeline import DeviceDataset, sample_batch, augment_batch
from .augment import mixup_cutmix
