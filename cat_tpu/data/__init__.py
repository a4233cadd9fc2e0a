from cat_tpu.data.datasets import (  # noqa: F401
    AlignedDataset,
    SingleDataset,
    UnalignedDataset,
    create_dataloader,
    create_eval_dataloader,
)
from cat_tpu.data.loader import DataLoader  # noqa: F401
