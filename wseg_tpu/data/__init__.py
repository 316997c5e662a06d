from wseg_tpu.data.pascal_voc import (  # noqa: F401
    AMBIGUOUS,
    CLASSES,
    CLASS_IDX,
    MEAN,
    NUM_CLASS,
    STD,
    VOCSegmentation,
    colorize,
    get_mask_palette_image,
    get_palette,
    labels_from_mask,
    read_filelist,
    voc_colormap,
)
from wseg_tpu.data.loader import DataLoader  # noqa: F401
from wseg_tpu.data.multiscale import (  # noqa: F401
    CropViews,
    MultiscaleViews,
    merge_crops,
    merge_multiscale,
)


def get_num_classes(dataset: str = "pascal_voc") -> int:
    return NUM_CLASS


def get_class_names(dataset: str = "pascal_voc"):
    return CLASSES


def get_dataloader(args, cfg, split, batch_size=None, scoremap_path=""):
    """Reference-compatible loader factory (datasets/__init__.py:14-30)."""
    shuffle = drop_last = split != "val_voc"
    dataset = VOCSegmentation(cfg.DATASET, split, root=cfg.DATASET.ROOT,
                              augment=shuffle,
                              seed=getattr(args, "random_seed", 0),
                              scoremap_path=scoremap_path)
    if batch_size is None:
        batch_size = cfg.TRAIN.BATCH_SIZE
    return DataLoader(dataset, batch_size, shuffle=shuffle,
                      drop_last=drop_last,
                      num_workers=getattr(args, "workers", 4))
