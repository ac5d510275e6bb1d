"""Inference engine (reference: maskrcnn_benchmark/engine/inference.py).

compute_on_dataset's eval loop (inference.py:45-66) becomes a jitted batched
forward over padded Boxes; the pickle-all_gather prediction merge
(inference.py:133-152, utils/comm.py:48-88) is unnecessary in single-process
SPMD — detections come back as fixed-shape arrays and are trimmed on host.
multi-host support gathers the per-host prediction lists via
jax.experimental.multihost_utils when processes > 1.
"""

from __future__ import annotations

import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..structures.image_batch import ImageBatch
from ..utils.metric_logger import Timer


def make_eval_step(model, mesh=None):
    """Jitted eval forward: (variables, batch) -> detection arrays.

    With a mesh, the batch is sharded over the ``data`` axis and variables
    are replicated — eval scales over all chips the way the reference
    scales over DDP ranks (engine/inference.py:50-66 + DistributedSampler),
    but in one process with XLA placing the work.
    """

    mask_on = bool(getattr(model.config, "mask_on", False))
    kp_on = bool(getattr(model.config, "keypoint_on", False))

    def eval_step(variables, batch):
        images = ImageBatch(pixels=batch["query_pixels"], sizes=batch["query_sizes"])
        supp = ImageBatch(pixels=batch["supp_pixels"], sizes=batch["supp_sizes"])
        dets = model.apply(
            variables, images, supp, target_ids=batch["target_ids"], train=False
        )
        out = (dets.xyxy, dets.get_field("scores"), dets.get_field("labels"),
               dets.valid)
        if mask_on:  # MODEL.MASK_ON: per-detection 28x28 fg-mask probs
            out = out + (dets.get_field("mask_probs"),)
        if kp_on:  # MODEL.KEYPOINT_ON: per-detection keypoint xy + scores
            out = out + (dets.get_field("keypoints_xy"),
                         dets.get_field("keypoints_scores"))
        return out

    if mesh is None:
        return jax.jit(eval_step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))
    return jax.jit(eval_step, in_shardings=(replicated, sharded),
                   out_shardings=sharded)


def make_cached_support_eval_steps(model, mesh=None):
    """Eval split into (support-features once per class) + (query forward).

    The per-class seq_test protocol (FEW_SHOT.CHOOSE_SELECTED) evaluates
    thousands of queries against a handful of FIXED supports; the reference
    still runs the support backbone every batch (generalized_rcnn.py:271-274).
    Here support features are computed once per distinct support and the
    query step consumes them, skipping the support branch entirely.
    """

    def support_step(variables, supp_pixels, supp_sizes):
        supp = ImageBatch(pixels=supp_pixels, sizes=supp_sizes)
        return model.apply(
            variables, supp, 1,
            method=lambda m, s, n: m.compute_support_features(s, n),
        )

    def query_step(variables, batch, supp_pooled, supp_7x7):
        images = ImageBatch(pixels=batch["query_pixels"], sizes=batch["query_sizes"])
        dets = model.apply(
            variables, images, supp_pooled, supp_7x7, batch["target_ids"],
            method=lambda m, im, p, s, t: m.detect_with_support(im, p, s, t),
        )
        out = (dets.xyxy, dets.get_field("scores"), dets.get_field("labels"),
               dets.valid)
        if getattr(model.config, "mask_on", False):
            out = out + (dets.get_field("mask_probs"),)
        if getattr(model.config, "keypoint_on", False):
            out = out + (dets.get_field("keypoints_xy"),
                         dets.get_field("keypoints_scores"))
        return out

    if mesh is None:
        return jax.jit(support_step), jax.jit(query_step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))
    return (
        jax.jit(support_step, in_shardings=(replicated, replicated, replicated),
                out_shardings=replicated),
        jax.jit(query_step,
                in_shardings=(replicated, sharded, sharded, sharded),
                out_shardings=sharded),
    )


def make_multiclass_eval_step(model, mesh=None):
    """One query backbone+FPN pass amortized over S support classes.

    The eval protocol revisits each query image once per class — the
    episodic dataset's length is Σ_cat #imgs(cat) (reference
    data/datasets/coco.py:181-203) — and fusion happens AFTER the query
    backbone (generalized_rcnn.py:270 vs :307-311), so the backbone+FPN
    pass (the single largest slice of the eval cost model) is legally
    shared across every class an image is evaluated against. This is the
    exact dual of cached supports (one support set serves all queries of a
    class; here one query pyramid serves all classes of a batch).

    Returns a jitted step:
        (variables, batch, supp_pooled_stack, supp_7x7_stack, target_ids)
          -> (xyxy, scores, labels, valid)  each with leading (S, B, ...)
    where supp_pooled_stack is a list per FPN level of (S, 1, 1, 1, C),
    supp_7x7_stack is (S, 1, shot, 7, 7, C) — class-level support features
    as produced by ``compute_support_features`` at batch 1, stacked over
    classes — and target_ids is (S,). The per-class body runs under
    ``lax.scan`` so per-class cost (and compiled code size) matches the
    single-class program.
    """
    mask_on = bool(getattr(model.config, "mask_on", False))
    kp_on = bool(getattr(model.config, "keypoint_on", False))

    def eval_step(variables, batch, supp_pooled_stack, supp_7x7_stack,
                  target_ids_stack):
        images = ImageBatch(pixels=batch["query_pixels"],
                            sizes=batch["query_sizes"])
        features = model.apply(
            variables, images, method=lambda m, im: m.backbone_features(im))
        sizes_wh = images.sizes_wh()

        def body(carry, xs):
            pooled, s7, tid = xs
            dets = model.apply(
                variables, features, sizes_wh, list(pooled), s7, tid,
                method=lambda m, f, sw, p, s, t:
                    m.detect_from_features(f, sw, p, s, t),
            )
            out = (dets.xyxy, dets.get_field("scores"),
                   dets.get_field("labels"), dets.valid)
            if mask_on:
                out = out + (dets.get_field("mask_probs"),)
            if kp_on:
                out = out + (dets.get_field("keypoints_xy"),
                             dets.get_field("keypoints_scores"))
            return carry, out

        xs = (tuple(supp_pooled_stack), supp_7x7_stack, target_ids_stack)
        _, outs = jax.lax.scan(body, jnp.float32(0.0), xs)
        return outs

    if mesh is None:
        return jax.jit(eval_step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))
    class_major = NamedSharding(mesh, P(None, "data"))
    return jax.jit(
        eval_step,
        in_shardings=(replicated, sharded, replicated, replicated, replicated),
        out_shardings=class_major,
    )


def compute_on_dataset(
    model,
    variables,
    data_loader,
    stop_iter: Optional[int] = None,
    logger=None,
    mesh=None,
    cache_supports: bool = False,
) -> List[Optional[dict]]:
    """Run eval over the loader; returns per-episode prediction dicts aligned
    with dataset order (None for episodes never reached, e.g. stop_iter —
    FEW_SHOT.STOP_ITER truncation, inference.py:126-127).

    cache_supports: compute support features once per target class and skip
    the support backbone afterwards — valid when the support for a class is
    fixed across episodes (FEW_SHOT.CHOOSE_SELECTED protocol)."""
    if cache_supports:
        support_step, query_step = make_cached_support_eval_steps(model, mesh=mesh)
        supp_cache: dict = {}
    else:
        eval_step = make_eval_step(model, mesh=mesh)
    if mesh is not None:
        from ..parallel.mesh import replicate, shard_batch

        variables = replicate(variables, mesh)
    results: dict = {}
    timer = Timer()
    n_images = 0
    for it, batch in enumerate(data_loader):
        if stop_iter is not None and it >= stop_iter:
            break
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if k not in ("img_ids", "idxs")}
        if mesh is not None:
            jbatch = shard_batch(jbatch, mesh)
        timer.tic()
        if cache_supports:
            b = jbatch["query_pixels"].shape[0]
            spp = jbatch["supp_pixels"].shape[0] // b  # shots (+aug) per image
            tids = np.asarray(batch["target_ids"]).tolist()
            for i, tid in enumerate(tids):
                if tid not in supp_cache:
                    supp_cache[tid] = support_step(
                        variables,
                        jbatch["supp_pixels"][i * spp:(i + 1) * spp],
                        jbatch["supp_sizes"][i * spp:(i + 1) * spp],
                    )
            pooled = [
                jnp.concatenate([supp_cache[t][0][lvl] for t in tids], axis=0)
                for lvl in range(len(supp_cache[tids[0]][0]))
            ]
            supp_7x7 = jnp.concatenate([supp_cache[t][1] for t in tids], axis=0)
            out = query_step(variables, jbatch, pooled, supp_7x7)
        else:
            out = eval_step(variables, jbatch)
        xyxy, scores, labels, valid = out[:4]
        extras = list(out[4:])
        mask_probs = None
        if getattr(model.config, "mask_on", False) and extras:
            mask_probs = np.asarray(extras.pop(0))
        kp_xy = kp_scores = None
        if getattr(model.config, "keypoint_on", False) and len(extras) >= 2:
            kp_xy, kp_scores = np.asarray(extras[0]), np.asarray(extras[1])
        jax.block_until_ready(xyxy)
        dt = timer.toc()
        b = batch["query_pixels"].shape[0]
        n_images += b
        xyxy = np.asarray(xyxy)
        scores = np.asarray(scores)
        valid = np.asarray(valid)
        for i in range(b):
            idx = int(batch["idxs"][i])
            v = valid[i]
            h, w = batch["query_sizes"][i]
            results[idx] = {
                "boxes": xyxy[i][v],
                "scores": scores[i][v],
                "input_size": (float(w), float(h)),
            }
            if mask_probs is not None:
                results[idx]["mask_probs"] = mask_probs[i][v]
            if kp_xy is not None:
                results[idx]["keypoints_xy"] = kp_xy[i][v]
                results[idx]["keypoints_scores"] = kp_scores[i][v]
        if logger and (it + 1) % 10 == 0:
            logger.info(
                f"eval iter {it + 1}: {dt / b * 1000:.1f} ms/im "
                f"(avg {timer.total_time / max(n_images, 1) * 1000:.1f})"
            )
    if logger:
        logger.info(
            f"Total eval: {n_images} images, "
            f"{timer.total_time / max(n_images, 1) * 1000:.2f} ms/im"
        )
    return results


def inference(
    cfg,
    model,
    variables,
    data_loader,
    dataset,
    output_folder: Optional[str] = None,
    stop_iter: Optional[int] = None,
    logger=None,
    mesh=None,
):
    """Full inference + evaluation (inference.py:155-213)."""
    from ..data.evaluation import evaluate
    from ..utils import comm

    t0 = time.time()
    # fixed per-class supports -> support features are computed once per
    # class and cached (the reference reruns the support backbone per batch)
    cache_supports = bool(cfg.FEW_SHOT.CHOOSE_SELECTED) and not cfg.FEW_SHOT.SUPP_AUG
    results_by_idx = compute_on_dataset(model, variables, data_loader,
                                        stop_iter, logger, mesh=mesh,
                                        cache_supports=cache_supports)
    if logger:
        logger.info(f"inference wall time: {time.time() - t0:.1f}s")
    # multi-host: merge per-host prediction dicts (the pickle-all_gather
    # analog of reference inference.py:133-152)
    if comm.get_world_size() > 1:
        merged = {}
        for part in comm.all_gather(results_by_idx):
            merged.update(part)
        results_by_idx = merged
        if not comm.is_main_process():
            return None
    predictions = [results_by_idx.get(i) for i in range(len(dataset))]
    if stop_iter is not None:
        # evaluate only reached episodes (reference truncates identically)
        reached = max(results_by_idx.keys(), default=-1) + 1
        predictions = predictions[:reached]
        trimmed = _TrimmedDataset(dataset, reached)
        return evaluate(trimmed, predictions, output_folder, logger,
                        box_only=cfg.MODEL.RPN_ONLY)
    return evaluate(dataset, predictions, output_folder, logger,
                    box_only=cfg.MODEL.RPN_ONLY)


class _TrimmedDataset:
    """View of the first N episodes of a dataset (stop_iter evaluation)."""

    def __init__(self, dataset, n):
        self._dataset = dataset
        self._n = n
        self.coco = dataset.coco
        self.id_to_img_map = {k: v for k, v in dataset.id_to_img_map.items() if k < n}

    def __len__(self):
        return self._n

    def get_img_info(self, index):
        return self._dataset.get_img_info(index)

    def __getattr__(self, name):
        return getattr(self._dataset, name)
