#!/usr/bin/env python
"""Query<->support embedding similarity for CHOOSE_CLOSE.

Rebuilds /root/reference/tools/feature_dist.py the TPU way: the reference
runs a torchvision-pretrained ResNet-50 over the episodic loader on CUDA and
prints raw feature tensors (the similarity pickles it feeds are produced
offline). Here the whole loop is productized: a jitted flax ResNet-50
embeds every query image and every candidate support crop in batches, and
the cosine similarities are written as the FEW_SHOT.SUPP_SIM_FILE pickle
that COCODataset's CHOOSE_CLOSE support selection consumes
(data/datasets/coco.py:146-157, 247-265):

    close_dict[cat_id][query_img_id][cat_id][ann_id] = similarity

Usage:
    python tools/feature_dist.py --config-file cfg.yaml \
        --weights R-50.pkl --out supp_sim.pkl
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def compute_close_dict(ds, pixel_mean, variables=None, size=224, batch=16,
                       limit=0):
    """Embed every query image and candidate support crop of ``ds`` with a
    ResNet-50 (GAP over C5, L2-normalized) and return the CHOOSE_CLOSE
    similarity dict. ``variables``: optional pre-loaded backbone variables;
    random init otherwise (rankings are then texture-level only)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from oneshotdet_tpu.models.resnet import ResNet

    model = ResNet(depth=50)
    if variables is None:
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
    mean = np.asarray(pixel_mean, np.float32)

    @jax.jit
    def embed(v, x):
        # BGR255 normalization, matching the training transform convention
        x = x[..., ::-1] - jnp.asarray(mean)
        feats = model.apply(v, x)
        return feats[-1].astype(jnp.float32).mean(axis=(1, 2))  # GAP over C5

    def embed_all(images):
        out = []
        for i in range(0, len(images), batch):
            out.append(np.asarray(
                embed(variables, jnp.asarray(np.stack(images[i:i + batch])))))
        emb = np.concatenate(out, axis=0)
        return emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-8)

    def prep(im):
        return np.asarray(
            im.convert("RGB").resize((size, size), Image.BILINEAR), np.float32)

    close_dict: dict = {}
    for cat_id, img_ids in sorted(ds.catalog.items()):
        # candidate supports: per catalogued image, the largest-area
        # annotation of this category — the same pick + bbox crop
        # get_random_item_from_cat makes (data/datasets/coco.py:174-216)
        anns = []
        for img_id in img_ids:
            cands = ds.coco.loadAnns(
                ds.coco.getAnnIds(imgIds=img_id, catIds=cat_id, iscrowd=False))
            if cands:
                anns.append(max(cands, key=lambda a: a["area"]))
        if not anns:
            continue
        crops = []
        for a in anns:
            im = ds._load_image(a["image_id"])
            x, y, w, h = a["bbox"]
            crops.append(prep(im.crop((x, y, x + max(w, 1), y + max(h, 1)))))
        supp_emb = embed_all(crops)

        # query images: every image containing this category
        q_ids = sorted({a["image_id"] for a in anns})
        if limit:
            q_ids = q_ids[:limit]
        q_emb = embed_all([prep(ds._load_image(i)) for i in q_ids])

        sims = q_emb @ supp_emb.T  # (Q, A) cosine similarities
        per_cat = {}
        for qi, qid in enumerate(q_ids):
            ranked = {
                int(anns[ai]["id"]): float(sims[qi, ai])
                for ai in range(len(anns))
                if anns[ai]["image_id"] != qid  # never pick the query itself
            }
            per_cat[qid] = {cat_id: ranked}
        close_dict[cat_id] = per_cat
        print(f"cat {cat_id}: {len(q_ids)} queries x {len(anns)} supports",
              flush=True)
    return close_dict


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", default="")
    p.add_argument("--weights", default="", help=".pth/.pkl backbone checkpoint")
    p.add_argument("--out", default="supp_sim.pkl")
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--limit", type=int, default=0,
                   help="cap on query images per category (0 = all)")
    p.add_argument("opts", nargs="*", default=[])
    args = p.parse_args()

    from oneshotdet_tpu.config import cfg
    from oneshotdet_tpu.data.datasets.coco import COCODataset
    from oneshotdet_tpu.data.paths_catalog import DatasetCatalog

    c = cfg.clone()
    if args.config_file:
        c.merge_from_file(args.config_file)
    if args.opts:
        c.merge_from_list(args.opts)

    info = DatasetCatalog.get(c.DATASETS.TRAIN[0])
    ds = COCODataset(c, ann_file=info["args"]["ann_file"],
                     root=info["args"]["root"], is_train=True, transforms=None)

    variables = None
    if args.weights:
        # .pth/.pkl reference checkpoint: graft the query-backbone body
        # subtree into the bare ResNet's variable collections
        import jax
        import jax.numpy as jnp

        from oneshotdet_tpu.models.resnet import ResNet
        from oneshotdet_tpu.utils.torch_import import load_torch_checkpoint

        model = ResNet(depth=50)
        variables = dict(model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, args.size, args.size, 3))))
        loaded = load_torch_checkpoint(args.weights)
        for coll in variables:
            sub = loaded.get(coll, {}).get("backbone", {}).get("body")
            if sub:
                variables[coll] = sub

    close_dict = compute_close_dict(
        ds, c.INPUT.PIXEL_MEAN, variables=variables, size=args.size,
        batch=args.batch, limit=args.limit)
    with open(args.out, "wb") as f:
        pickle.dump(close_dict, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
