"""Training CLI.

Parity target: /root/reference/src/train.py:38-342 — seeding, model/
criterion/postprocessor build, param-group optimizer + LR drop, datasets and
weighted sampling, shape-adaptive resume, epoch loop with val-interval
evaluation, best-checkpoint selection, debug/eval_only/eval_train modes,
resolved-config dump.

Usage: python -m trackformer_tpu.cli.train with [named_cfgs...] k=v ...
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np


class Loader:
    """Host-side batch loader with optional weighted sampling and
    background-thread prefetch (replaces DataLoader workers +
    DistributedWeightedSampler; per-host shards replace DistributedSampler,
    SURVEY.md §2.3)."""

    def __init__(self, dataset, batch_size: int, collate, shuffle: bool,
                 weights=None, seed: int = 0, process_index: int = 0,
                 process_count: int = 1, drop_last: bool = True,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.shuffle = shuffle
        self.weights = weights
        self.seed = seed
        self.epoch = 0
        self.pi, self.pc = process_index, process_count
        self.drop_last = drop_last
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset) // self.pc
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        n = len(self.dataset)
        if self.weights is not None:
            w = np.asarray(self.weights, np.float64)
            order = rng.choice(n, size=n, replace=True, p=w / w.sum())
        elif self.shuffle:
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        order = order[self.pi::self.pc]
        self.epoch += 1

        def gen():
            batch = []
            for idx in order:
                batch.append(self.dataset[int(idx)])
                if len(batch) == self.batch_size:
                    yield self.collate(batch)
                    batch = []
            if batch and not self.drop_last:
                yield self.collate(batch)

        if not self.prefetch:
            yield from gen()
            return
        # background-thread prefetch (image decode/augment overlaps step)
        import queue as _queue
        import threading
        q = _queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for item in gen():
                    q.put(item)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ..datasets import build_dataset
    from ..datasets.builder import collate_fn
    from ..engine import TrainState, make_optimizer, make_train_step
    from ..engine.loop import evaluate, train_one_epoch
    from ..models import build_model
    from ..parallel import make_mesh
    from ..structures import FrameBatch
    from ..utils.checkpoint import CheckpointManager, load_and_adapt
    from ..utils.config import (dump_config, namespace_to_dict,
                                nested_namespace, parse_cli)
    from ..vis import build_visualizers
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = parse_cli(argv or sys.argv[1:], base="train.yaml")
    args = nested_namespace(cfg)

    if args.output_dir:
        Path(args.output_dir).mkdir(parents=True, exist_ok=True)
        dump_config(cfg, Path(args.output_dir) / "config.yaml")

    np.random.seed(args.seed + jax.process_index())
    rng = jax.random.PRNGKey(args.seed)

    model, criterion_cfg, postprocessors, tracking_cfg = build_model(args)
    vis = build_visualizers(args)

    # datasets + loaders
    dataset_train = build_dataset("train", args) \
        if not args.eval_only else None
    dataset_val = build_dataset("val", args)
    tpu_cfg = namespace_to_dict(getattr(args, "tpu", None)) or {}
    buckets = [tuple(b) for b in tpu_cfg.get(
        "image_buckets", [[608, 1088], [800, 1344], [1088, 1920]])]
    max_objects = int(tpu_cfg.get("max_objects", 100))

    def collate(samples):
        return collate_fn(samples, buckets, max_objects,
                          with_masks=args.masks)

    # data-parallel mesh over the largest device count dividing the batch;
    # tpu.model_parallel > 1 carves a second "model" axis off the devices
    # and shards attention heads / FFN hidden over it (parallel/tp.py)
    n_dev = len(jax.devices())
    mp = int(tpu_cfg.get("model_parallel", 1) or 1)
    if mp > 1:
        from ..parallel import make_mesh_2d
        n_data = max(d for d in range(1, n_dev // mp + 1)
                     if args.batch_size % d == 0)
        mesh = make_mesh_2d(n_data, mp)
    else:
        use_dev = max(d for d in range(1, n_dev + 1)
                      if args.batch_size % d == 0)
        mesh = make_mesh(use_dev)
    data_sh = NamedSharding(mesh, P("data"))
    repl_sh = NamedSharding(mesh, P())

    def device_put(pack):
        return jax.tree.map(lambda x: jax.device_put(np.asarray(x), data_sh),
                            pack)

    # eval_train: run evaluation over the training split
    # (reference train.py:285-291)
    if getattr(args, "eval_train", False):
        dataset_val = dataset_train or build_dataset("train", args)
    # TPU-only knob: cap evaluation to the first N images so periodic val
    # doesn't re-iterate a full split every interval (tpu.eval_subset=0
    # keeps the reference's full-split behavior, train.py:285-291)
    eval_subset = int(tpu_cfg.get("eval_subset", 0) or 0)
    if eval_subset and len(dataset_val) > eval_subset:
        class _EvalSubset:
            def __init__(self, base, n):
                self._base, self._n = base, n

            def __len__(self):
                return self._n

            def __getitem__(self, i):
                return self._base[i]

            def __getattr__(self, name):  # GT access for the evaluator
                return getattr(self._base, name)

        print(f"EVAL SUBSET: {eval_subset}/{len(dataset_val)} images")
        dataset_val = _EvalSubset(dataset_val, eval_subset)
    loader_val = Loader(dataset_val, args.batch_size, collate, shuffle=False,
                        process_index=jax.process_index(),
                        process_count=jax.process_count())

    # init params with a small dummy batch
    init_batch = FrameBatch.from_images(jnp.zeros((1, 128, 128, 3)),
                                        jnp.array([[128, 128]]))
    params = jax.jit(model.init)(rng, init_batch)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"NUM TRAINABLE MODEL PARAMS: {n_params}")

    # warm start / resume (reference train.py:149-264)
    if args.resume and os.path.exists(args.resume):
        params = load_and_adapt(args.resume, params,
                                resume_shift_neuron=args.resume_shift_neuron)
        print(f"RESUME: {args.resume}")
    if args.load_mask_head_from_model and os.path.exists(
            args.load_mask_head_from_model):
        from ..utils.checkpoint import (flatten_params, load_params_npz,
                                        unflatten_params)
        mask_flat = flatten_params(load_params_npz(
            args.load_mask_head_from_model))
        tgt = flatten_params(params)
        for k, v in mask_flat.items():
            if ("mask_head" in k or "bbox_attention" in k) and k in tgt \
                    and tgt[k].shape == v.shape:
                tgt[k] = v
        params = unflatten_params(tgt)
        print(f"LOADED MASK HEAD: {args.load_mask_head_from_model}")

    steps_per_epoch = (len(dataset_train) // max(args.batch_size, 1)
                       if dataset_train else 1)
    args.lr_drop_steps = args.lr_drop * steps_per_epoch
    if mp > 1:
        # shard params BEFORE optimizer init so optax's zeros_like moment
        # buffers inherit the model-axis shardings; non-matching leaves
        # (and TrainState.step) land replicated
        from ..parallel import shard_params
        params = shard_params(params, mesh)
    optimizer = make_optimizer(args, params)
    state = TrainState.create(params, optimizer)
    if mp > 1:
        state = state.replace(step=jax.device_put(state.step, repl_sh))
    else:
        state = jax.tree.map(lambda x: jax.device_put(x, repl_sh), state)

    ckpt = None
    start_epoch = args.start_epoch
    if args.output_dir:
        ckpt = CheckpointManager(args.output_dir, args.save_model_interval)
        if args.resume_optim:
            state, last_epoch = ckpt.restore(state)
            if last_epoch:
                start_epoch = last_epoch + 1

    train_step = jax.jit(make_train_step(
        model, criterion_cfg, optimizer, tracking_cfg,
        tracking=args.tracking, prev_prev=args.track_prev_prev_frame))

    def run_eval():
        from ..datasets.builder import get_coco_api_from_dataset
        return evaluate(model, state.params, criterion_cfg, postprocessors,
                        loader_val, device_put,
                        get_coco_api_from_dataset(dataset_val), args, vis,
                        obj_detector_model=(model, state.params, args,
                                            postprocessors))

    if args.eval_only:
        stats = run_eval()
        print("EVAL:", {k: v for k, v in stats.items()
                        if np.isscalar(v)})
        return stats

    loader_train = Loader(
        dataset_train, args.batch_size, collate, shuffle=True,
        weights=getattr(dataset_train, "sample_weights", None),
        seed=args.seed, process_index=jax.process_index(),
        process_count=jax.process_count())

    print("START TRAINING")
    start_time = time.time()
    for epoch in range(start_epoch, args.epochs + 1):
        state, train_stats = train_one_epoch(
            train_step, state, loader_train, device_put, epoch, rng,
            criterion_cfg.weight_dict, vis=vis,
            print_freq=args.vis_and_log_interval, debug=args.debug,
            profile_dir=(args.tpu.profile_dir
                         if epoch == start_epoch else ""),
            profile_steps=args.tpu.profile_steps)

        val_stats = {}
        if epoch == args.epochs or (args.val_interval
                                    and epoch % args.val_interval == 0):
            val_stats = run_eval()

        if vis is not None:
            vis.log_epoch(epoch, {**train_stats,
                                  **{k: v for k, v in val_stats.items()
                                     if np.isscalar(v)}})
        if ckpt is not None:
            best_metrics = {k: v for k, v in val_stats.items()
                            if k in ("AP", "AP50", "MOTA", "IDF1")}
            ckpt.save(state, epoch, best_metrics, config=cfg)
        if args.debug and epoch >= start_epoch:
            break

    total = time.time() - start_time
    print(f"TRAINING DONE in {total / 3600:.2f} h")
    return state


if __name__ == "__main__":
    main()
