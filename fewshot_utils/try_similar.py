#!/usr/bin/env python
"""Rank candidate supports by feature similarity to each query image
(reference: fewshot_utils/try_similar.py).

Embeds every large-enough object crop with the framework's own ResNet-50
(global-average C5 feature) and writes the per-(query image, class) cosine
similarity ranking pickle FEW_SHOT.CHOOSE_CLOSE consumes
(data/datasets/coco.py get_close_item_from_cat):

    pkl[cat_id][query_img_id][cat_id] = {ann_id: similarity, ...}
"""

import argparse
import os
import pickle
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann-file", required=True)
    p.add_argument("--img-dir", required=True)
    p.add_argument("--out", default="supp_sim/supp_similarity_merged.pkl")
    p.add_argument("--min-area", type=float, default=80 * 80)
    p.add_argument("--max-candidates", type=int, default=64)
    p.add_argument("--device", default="")
    args = p.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp

    from oneshotdet_tpu.data.coco_api import LiteCOCO
    from oneshotdet_tpu.models import ResNet

    model = ResNet(depth=50)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))

    @jax.jit
    def embed(x):
        c5 = model.apply(variables, x)[-1]
        f = c5.mean(axis=(1, 2))
        return f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-6)

    def crop_embed(img, bbox):
        x, y, w, h = bbox
        crop = img.crop((x, y, x + w, y + h)).resize((224, 224), Image.BILINEAR)
        arr = np.asarray(crop, np.float32)[:, :, ::-1] - np.array(
            [102.9801, 115.9465, 122.7717], np.float32
        )
        return np.asarray(embed(jnp.asarray(arr)[None]))[0]

    coco = LiteCOCO(args.ann_file)
    out = {}
    for cat in coco.getCatIds():
        anns = [a for a in coco.loadAnns(coco.getAnnIds(catIds=cat, iscrowd=False))
                if a["area"] > args.min_area][: args.max_candidates]
        if not anns:
            continue
        embeds = {}
        for a in anns:
            info = coco.loadImgs(a["image_id"])[0]
            img = Image.open(os.path.join(args.img_dir, info["file_name"])).convert("RGB")
            embeds[a["id"]] = crop_embed(img, a["bbox"])
        out[cat] = {}
        for img_id in coco.getImgIds(catIds=cat):
            q_anns = coco.loadAnns(coco.getAnnIds(imgIds=img_id, catIds=cat, iscrowd=False))
            if not q_anns:
                continue
            q = max(q_anns, key=lambda a: a["area"])
            info = coco.loadImgs(img_id)[0]
            img = Image.open(os.path.join(args.img_dir, info["file_name"])).convert("RGB")
            qe = crop_embed(img, q["bbox"])
            sims = {
                ann_id: float(np.dot(qe, e))
                for ann_id, e in embeds.items()
                # a query image must not be its own support
                if coco.anns[ann_id]["image_id"] != img_id
            }
            out[cat][img_id] = {cat: sims}
        print(f"cat {cat}: {len(out[cat])} query entries")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(out, f)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
