"""Dataset registry + loader factory.

The reference resolves datasets by importlib name-mangling
(ctu/data/__init__.py:12-38); here it's an explicit dict. ``create_dataloader``
mirrors ctu/data/__init__.py:41-55 (shuffle/drop_last only in training).
"""

from jpdse_tpu.config import Config
from jpdse_tpu.data.ade20k import ADE20KDataset
from jpdse_tpu.data.cityscapes import CityscapesDataset
from jpdse_tpu.data.clic import ClicDataset
from jpdse_tpu.data.custom import CustomDataset
from jpdse_tpu.data.loader import DataLoader, collate  # noqa: F401
from jpdse_tpu.data.paired import PairedDataset  # noqa: F401

DATASET_REGISTRY = {
    "cityscapes": CityscapesDataset,
    "ade20k": ADE20KDataset,
    "clic": ClicDataset,
    "custom": CustomDataset,
}


def find_dataset_using_name(name: str):
    if name not in DATASET_REGISTRY:
        raise KeyError(
            f"dataset '{name}' not registered; available: {sorted(DATASET_REGISTRY)}"
        )
    return DATASET_REGISTRY[name]


def create_dataloader(cfg: Config) -> DataLoader:
    dataset = find_dataset_using_name(cfg.data.dataset)(cfg)
    print(f"dataset [{type(dataset).__name__}] of size {len(dataset)} was created")
    # multi-host training: each process feeds a disjoint rank-strided shard
    # (jax.distributed initialized at entry, platform.init_distributed);
    # eval stays unsharded so every host sees the same metric stream
    rank, world = 0, 1
    if cfg.is_train:
        try:
            import jax

            if jax.process_count() > 1:
                rank, world = jax.process_index(), jax.process_count()
        except Exception:
            pass
    return DataLoader(
        dataset,
        batch_size=cfg.data.batch_size,
        shuffle=cfg.is_train,
        drop_last=cfg.is_train,
        num_workers=cfg.data.num_workers,
        seed=cfg.optim.seed,
        rank=rank,
        world=world,
    )
