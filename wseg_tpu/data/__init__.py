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
    """Reference-compatible loader factory (datasets/__init__.py:14-30).

    The training split uses Grain worker PROCESSES by default (the
    reference uses torch DataLoader worker processes; PIL decode+augment
    only partially releases the GIL, so threads cannot keep a fast device
    step fed).  Set ``WSEG_LOADER=threads`` to force the in-process
    threaded loader (validation always uses it: eval batches are few).
    """
    import os

    shuffle = drop_last = split != "val_voc"
    dataset = VOCSegmentation(cfg.DATASET, split, root=cfg.DATASET.ROOT,
                              augment=shuffle,
                              seed=getattr(args, "random_seed", 0),
                              scoremap_path=scoremap_path,
                              device_jitter=bool(getattr(
                                  cfg.DATASET, "DEVICE_JITTER", False)))
    if batch_size is None:
        batch_size = cfg.TRAIN.BATCH_SIZE
    workers = int(getattr(args, "workers", 4) or 0)
    ncpu = os.cpu_count() or 1
    # more workers than cores just thrashes the scheduler: measured on
    # the 1-core host, 4 decode THREADS sustain 58 img/s vs 72 with one
    # (decode already overlaps the dispatch thread; extra threads only
    # add GIL contention), and processes multiply IPC on top
    workers = min(workers, ncpu)
    choice = os.environ.get("WSEG_LOADER",
                            "grain" if ncpu >= 3 else "threads")
    if shuffle and workers > 0 and choice == "grain":
        # multi-host readiness: each process loads its own shard of the
        # global shuffle (single-process: 0 of 1 = the whole dataset)
        import jax
        from wseg_tpu.data.grain_loader import make_train_loader
        return make_train_loader(
            dataset, batch_size, use_grain=True, shuffle=True,
            drop_last=True, num_workers=workers,
            seed=getattr(args, "random_seed", 0),
            shard_index=jax.process_index(),
            shard_count=jax.process_count())
    return DataLoader(dataset, batch_size, shuffle=shuffle,
                      drop_last=drop_last,
                      num_workers=workers or 1,
                      seed=getattr(args, "random_seed", 0))
