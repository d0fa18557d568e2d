"""Tracking/evaluation CLI.

Parity target: /root/reference/src/track.py:29-205 — load the detector from
a checkpoint + its saved config, run the Tracker over every sequence of the
named dataset, write MOTChallenge/MOTS result files, optionally interpolate
and render frames, accumulate CLEAR-MOT/IDF1 metrics, print per-seq runtime
and overall Hz.

Usage: python -m trackformer_tpu.cli.track with [named_cfgs...] k=v ...
"""
from __future__ import annotations

import os
import os.path as osp
import sys
import time
from pathlib import Path

import numpy as np


def main(argv=None, obj_detector_model=None):
    import jax

    from ..models import build_model
    from ..datasets.tracking import TrackDatasetFactory
    from ..tracking import Tracker
    from ..utils import track_utils
    from ..utils.checkpoint import load_and_adapt
    from ..utils.config import (dump_config, load_config, namespace_to_dict,
                                nested_namespace, parse_cli)
    from ..structures import FrameBatch

    cfg = parse_cli(argv or sys.argv[1:], base="track.yaml")
    args = nested_namespace(cfg)
    np.random.seed(args.seed)

    if args.output_dir:
        dump_config(cfg, Path(args.output_dir) / "track.yaml")

    # --- detector -------------------------------------------------------
    if obj_detector_model is None:
        ckpt_file = args.obj_detect_checkpoint_file
        cfg_path = (osp.join(osp.dirname(ckpt_file), "config.yaml")
                    if ckpt_file else None)
        if cfg_path and osp.exists(cfg_path):
            import yaml
            with open(cfg_path) as f:
                train_cfg = yaml.safe_load(f)
            train_args = nested_namespace(train_cfg)
        else:
            train_args = nested_namespace(load_config(
                "train.yaml", ["deformable", "tracking", "multi_frame"]))
        model, _, postprocessors, _ = build_model(train_args)

        h, w = 8 * 64, 8 * 64
        import jax.numpy as jnp
        init_batch = FrameBatch.from_images(
            jnp.zeros((1, 64, 64, 3)), jnp.array([[64, 64]]))
        params = jax.jit(model.init)(jax.random.PRNGKey(args.seed),
                                     init_batch)
        if ckpt_file and osp.exists(ckpt_file):
            params = load_and_adapt(ckpt_file, params)
            print(f"loaded detector weights: {ckpt_file}")
        else:
            print(f"WARNING: checkpoint {ckpt_file!r} not found - "
                  "running with random weights")
    else:
        model, params, train_args, postprocessors = obj_detector_model

    attn_hw = None
    if args.generate_attention_maps:
        assert not getattr(train_args, "deformable", False), \
            "attention maps are only available for vanilla DETR " \
            "(reference tracker.py:38)"

        def apply_fn(p, b, t, pf):
            (out, tgts, feats, memory, hs), inters = model.apply(
                p, b, t, pf, deterministic=True,
                mutable=["intermediates"])
            last = f"decoder_layer_{train_args.dec_layers - 1}"
            attn = inters["intermediates"]["transformer"][last][
                "multihead_attn"]["attn_weights"][0]  # (B, Q, HW)
            mh, mw = memory.shape[1:3]
            out["attention_maps"] = attn.reshape(
                attn.shape[0], attn.shape[1], mh, mw)
            return out, tgts, feats, memory, hs
    else:
        def apply_fn(p, b, t, pf):
            return model.apply(p, b, t, pf, deterministic=True)

    tracker_cfg = namespace_to_dict(args.tracker_cfg)
    tpu_cfg = namespace_to_dict(getattr(args, "tpu", None)) or {}
    tracker_cfg["max_tracks"] = tpu_cfg.get("max_tracks", 150)
    tracker = Tracker(
        params, apply_fn, postprocessors["bbox"], tracker_cfg,
        hidden_dim=train_args.hidden_dim,
        num_object_queries=train_args.num_queries,
        overflow_boxes=train_args.overflow_boxes,
        with_masks=train_args.masks,
        attn_hw="auto" if args.generate_attention_maps else None,
        verbose=args.verbose)

    dataset = TrackDatasetFactory(
        args.dataset_name, root_dir=args.data_root_dir,
        img_transform=train_args.img_transform)

    # batched multi-sequence throughput mode (tracking/batched.py)
    batch_seqs = int(tpu_cfg.get("batch_sequences", 1) or 1)
    if batch_seqs > 1 and args.load_results_dir is None:
        from ..tracking.batched import BatchedTracker, group_by_shape
        bt = BatchedTracker(params, apply_fn, postprocessors["bbox"],
                            tracker_cfg,
                            hidden_dim=train_args.hidden_dim,
                            num_object_queries=train_args.num_queries,
                            overflow_boxes=train_args.overflow_boxes,
                            with_masks=train_args.masks,
                            postprocess_segm=postprocessors.get("segm"))
        mot_accums, seq_names = [], []
        time_total, num_frames = 0.0, 0
        for group in group_by_shape(list(dataset), batch_seqs):
            t0 = time.time()
            group_results = bt.run(
                group, (args.frame_range.start, args.frame_range.end))
            t = time.time() - t0
            n = sum(len(s) for s in group)
            time_total += t
            num_frames += n
            print(f"BATCHED GROUP x{len(group)}: {t:.2f} s "
                  f"({n / max(t, 1e-9):.2f} Hz)")
            for seq, results in zip(group, group_results):
                if train_args.masks:
                    s0 = int(len(seq) * args.frame_range.start)
                    blob0 = seq[s0]
                    results = track_utils.upscale_mask_results(
                        results, np.asarray(blob0["size"]).reshape(-1),
                        np.asarray(blob0["orig_size"]).reshape(-1),
                        blob0["batch"].images.shape[1:3])
                if args.interpolate:
                    results = track_utils.interpolate_tracks(results)
                if args.output_dir is not None:
                    seq.write_results(results, args.output_dir)
                if not seq.no_gt:
                    mot_accums.append(track_utils.get_mot_accum(results,
                                                                seq))
                    seq_names.append(str(seq))
        print(f"RUNTIME ALL SEQS: {time_total:.2f} s for {num_frames} "
              f"frames ({num_frames / max(time_total, 1e-9):.2f} Hz)")
        if mot_accums:
            print("EVAL:")
            return track_utils.evaluate_mot_accums(mot_accums, seq_names)
        return None

    # distributed eval: sequences round-robin over processes
    # (reference engine.py:289-303)
    proc_i, proc_n = jax.process_index(), jax.process_count()

    time_total, num_frames = 0.0, 0
    mot_accums, seq_names = [], []
    for seq_idx, seq in enumerate(dataset):
        if proc_n > 1 and seq_idx % proc_n != proc_i:
            continue
        tracker.reset()
        n = len(seq)
        start = int(n * args.frame_range.start)
        end = int(n * args.frame_range.end)
        indices = range(start, end)

        results = seq.load_results(args.load_results_dir)
        if not results:
            t0 = time.time()
            for i in indices:
                tracker.step(seq[i])
                num_frames += 1
            results = tracker.get_results()
            t = time.time() - t0
            time_total += t
            print(f"NUM TRACKS: {len(results)} ReIDs: {tracker.num_reids}")
            print(f"RUNTIME: {t:.2f} s ({(end - start) / max(t, 1e-9):.2f} Hz)")
            if train_args.masks:
                blob0 = seq[start]
                results = track_utils.upscale_mask_results(
                    results, np.asarray(blob0["size"]).reshape(-1),
                    np.asarray(blob0["orig_size"]).reshape(-1),
                    blob0["batch"].images.shape[1:3])

        if args.interpolate:
            results = track_utils.interpolate_tracks(results)

        if args.output_dir is not None:
            print(f"WRITE RESULTS: {seq}")
            seq.write_results(results, args.output_dir)

        if not seq.no_gt:
            mot_accums.append(track_utils.get_mot_accum(results, seq))
            seq_names.append(str(seq))

        if args.write_images and args.output_dir:
            track_utils.plot_sequence(
                results, seq, osp.join(args.output_dir, str(seq)),
                args.write_images)

    if num_frames:
        print(f"RUNTIME ALL SEQS (w/o EVAL or IMG WRITE): "
              f"{time_total:.2f} s for {num_frames} frames "
              f"({num_frames / max(time_total, 1e-9):.2f} Hz)")
    # merge per-process accumulators so every process reports global
    # metrics (reference engine.py:326-332 all_gathers mot_accums)
    if proc_n > 1:
        from ..parallel import all_gather_objects
        merged_accums, merged_names = [], []
        for accums, names in all_gather_objects((mot_accums, seq_names)):
            merged_accums.extend(accums)
            merged_names.extend(names)
        mot_accums, seq_names = merged_accums, merged_names
    if mot_accums:
        print("EVAL:")
        summary = track_utils.evaluate_mot_accums(mot_accums, seq_names)
        return summary
    return None


if __name__ == "__main__":
    main()
