"""Dataset readers + host-side input pipeline feeding the device trainer."""

from tpu3drec.data.datasets import (
    SequenceSpec,
    InteriorNetDataset,
    KittiRawDataset,
    AirSimCaptureDataset,
    write_split_files,
)
from tpu3drec.data.loader import TripletLoader
