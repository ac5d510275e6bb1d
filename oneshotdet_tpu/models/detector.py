"""Siamese GeneralizedRCNN — the one-shot detector meta-architecture.

Reimplements modeling/detector/generalized_rcnn.py as a flax module with a
functional train/eval forward:

  stage 0: query and support go through (optionally separate) ResNet-50-FPN
           backbones (generalized_rcnn.py:270-278, SIAMESE_BACKBONE);
  fusion:  support features are ROIAligned to 1x1 per FPN level over the
           whole support box (SuppAlignLayer, :20-52), shot-averaged
           (batch_pooling, :100-104), and broadcast-multiplied into the
           query pyramid (:307-311);
  stage 1: class-agnostic FCOS on the fused pyramid -> proposals (:312);
  stage 2: 7x7 ROI features of the *raw* query pyramid + 7x7 whole-support
           ROI features -> relation head (:314-318).

Note on a reference quirk: the whole-support box is built as
``[0, 0, h, w]`` (generalized_rcnn.py:257 — image_sizes is (h, w) but
BoxList expects (x, y) order), i.e. x2/y2 are swapped for non-square
supports. This rebuild uses the correct ``[0, 0, w, h]``; models trained
here are self-consistent, and reference-checkpoint evaluation can only be
affected for strongly non-square supports.

Everything is static-shape: proposals are padded Boxes, NMS/top-k are
masked ops, and the whole forward jits into a single XLA program.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ..ops.box_coder import BoxCoder
from ..ops.roi_align import fpn_level_map, multilevel_roi_align, roi_align
from ..structures.boxes import Boxes, cat_boxes
from ..structures.image_batch import ImageBatch
from .fcos import FCOSHead, compute_locations, fcos_losses, fcos_postprocess, fcos_targets
from .fpn import ResNetFPN
from .roi_head import (
    ROIBoxHeadNet,
    predictor_num_classes,
    prepare_roi_targets,
    roi_head_loss,
    roi_head_postprocess,
)


@struct.dataclass
class DetectorConfig:
    """Static (hashable) model hyperparameters extracted from the cfg tree."""

    # backbone
    depth: int = 50
    out_channels: int = 256
    use_c5_for_p6: bool = False
    siamese_backbone: bool = True
    # stage-1 dispatch (build_rpn, ref rpn.py:201-210): FCOS_ON -> fcos,
    # else RETINANET_ON -> retinanet, else the classic anchor RPN
    stage1: str = "fcos"
    # anchor RPN (MODEL.RPN.*)
    rpn_anchor_sizes: Tuple[float, ...] = (32, 64, 128, 256, 512)
    rpn_aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    rpn_anchor_stride: Tuple[int, ...] = (16,)
    rpn_straddle_thresh: float = 0.0
    rpn_fg_iou: float = 0.7
    rpn_bg_iou: float = 0.3
    rpn_batch_per_image: int = 256
    rpn_positive_fraction: float = 0.5
    rpn_post_nms_top_n_train: int = 4000
    rpn_post_nms_top_n_test: int = 2000
    rpn_min_size: float = 0.0
    # RetinaNet (MODEL.RETINANET.*)
    retina_num_classes: int = 1            # foreground classes = NUM_CLASSES - 1
    retina_anchor_sizes: Tuple[float, ...] = (32, 64, 128, 256, 512)
    retina_anchor_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    retina_aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    retina_octave: float = 2.0
    retina_scales_per_octave: int = 3
    retina_fg_iou: float = 0.5
    retina_bg_iou: float = 0.4
    retina_inference_th: float = 0.0
    retina_pre_nms_top_n: int = 12000
    retina_nms_th: float = 0.4
    retina_num_convs: int = 4
    retina_prior_prob: float = 0.01
    # fcos
    fpn_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    dense_points: int = 1
    num_convs: int = 4
    prior_prob: float = 0.01
    center_sample: bool = True
    pos_radius: float = 1.5
    loc_loss_type: str = "giou"
    loss_gamma: float = 2.0
    loss_alpha: float = 0.25
    focal_mode: str = "SIGMOID"
    score_mode: str = "BINARY"
    # rpn-mode postprocessing
    rpn_only: bool = False
    pre_nms_top_n_train: int = 12000
    pre_nms_top_n_test: int = 6000
    rpn_nms_thresh: float = 0.8
    fpn_post_nms_top_n_train: int = 4000
    fpn_post_nms_top_n_test: int = 2000
    nms_pre_topk: int = 8192
    strict_level_topk: bool = False
    # detector-mode (RPN_ONLY=True) postprocessing
    inference_th: float = 0.0
    fcos_nms_th: float = 0.6
    fcos_pre_nms_top_n: int = 12000
    detections_per_img_rpn_only: int = 4000
    # roi head
    pooler_resolution: int = 7
    pooler_scales: Tuple[float, ...] = (0.125, 0.0625, 0.03125, 0.015625, 0.0078125)
    pooler_sampling_ratio: int = 2
    mlp_head_dim: int = 1024
    second_stage_method: str = "concat"
    second_stage_cls_loss: str = "ce_loss"
    linear_fusion: bool = False
    neg_support: bool = False
    cls_agnostic_bbox_reg: bool = False
    bbox_reg_weights: Tuple[float, ...] = (10.0, 10.0, 5.0, 5.0)
    roi_batch_size_per_image: int = 128
    roi_positive_fraction: float = 0.25
    roi_fg_iou: float = 0.5
    roi_bg_iou: float = 0.5
    roi_score_thresh: float = 0.0
    roi_nms_thresh: float = 0.5
    roi_detections_per_img: int = 2000
    # opt-in eval proposal compaction: keep only the top-K stage-1 proposals
    # (already score-sorted post-NMS) before ROIAlign + the ROI head; 0 = off
    # (TPU.EVAL_ROI_TOPK — the reference's own cap chain stops at
    # FPN_POST_NMS_TOP_N_TEST=2000, rpn/fcos/inference.py:289-323)
    eval_roi_topk: int = 0
    # mask / keypoint heads (MODEL.MASK_ON / KEYPOINT_ON,
    # ref roi_heads/roi_heads.py:29-55)
    mask_on: bool = False
    keypoint_on: bool = False
    mask_pooler_resolution: int = 14
    mask_pooler_scales: Tuple[float, ...] = (0.0625,)
    mask_pooler_sampling_ratio: int = 2
    mask_conv_layers: Tuple[int, ...] = (256, 256, 256, 256)
    postprocess_masks: bool = False
    postprocess_masks_threshold: float = 0.5
    kp_pooler_resolution: int = 14
    kp_pooler_scales: Tuple[float, ...] = (0.0625,)
    kp_pooler_sampling_ratio: int = 2
    kp_conv_layers: Tuple[int, ...] = tuple(512 for _ in range(8))
    num_keypoints: int = 17
    mask_raster: int = 56
    # few-shot
    add_artificial_proposals: bool = False
    num_shot: int = 1
    supp_aug: bool = False
    num_supp_aug: int = 1
    supp_aug_method: str = "avg"   # avg | max | conv (ref :280-294)
    supp_roialign: bool = True
    max_gt: int = 64
    remat_backbone: bool = False
    quant: str = "none"  # TPU.QUANT: int8 conv stack (backbone/FPN/towers)
    soft_labeling: bool = False
    soft_labeling_func: str = "linear"
    reverse_order: bool = False
    loss_weighted: bool = False


def detector_config_from_cfg(cfg) -> DetectorConfig:
    """Map the yacs-style cfg tree onto the static DetectorConfig."""
    if cfg.MODEL.FCOS_ON:
        stage1 = "fcos"
    elif cfg.MODEL.RETINANET_ON:
        stage1 = "retinanet"
    else:
        stage1 = "rpn"
    return DetectorConfig(
        depth=50 if "50" in cfg.MODEL.BACKBONE.CONV_BODY else 101,
        out_channels=cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS,
        use_c5_for_p6=cfg.MODEL.RETINANET.USE_C5,
        siamese_backbone=cfg.FEW_SHOT.SIAMESE_BACKBONE,
        stage1=stage1,
        rpn_anchor_sizes=tuple(cfg.MODEL.RPN.ANCHOR_SIZES),
        rpn_aspect_ratios=tuple(cfg.MODEL.RPN.ASPECT_RATIOS),
        rpn_anchor_stride=tuple(cfg.MODEL.RPN.ANCHOR_STRIDE),
        rpn_straddle_thresh=float(cfg.MODEL.RPN.STRADDLE_THRESH),
        rpn_fg_iou=cfg.MODEL.RPN.FG_IOU_THRESHOLD,
        rpn_bg_iou=cfg.MODEL.RPN.BG_IOU_THRESHOLD,
        rpn_batch_per_image=cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
        rpn_positive_fraction=cfg.MODEL.RPN.POSITIVE_FRACTION,
        rpn_post_nms_top_n_train=cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN,
        rpn_post_nms_top_n_test=cfg.MODEL.RPN.POST_NMS_TOP_N_TEST,
        rpn_min_size=float(cfg.MODEL.RPN.MIN_SIZE),
        retina_num_classes=cfg.MODEL.RETINANET.NUM_CLASSES - 1,
        retina_anchor_sizes=tuple(cfg.MODEL.RETINANET.ANCHOR_SIZES),
        retina_anchor_strides=tuple(cfg.MODEL.RETINANET.ANCHOR_STRIDES),
        retina_aspect_ratios=tuple(cfg.MODEL.RETINANET.ASPECT_RATIOS),
        retina_octave=cfg.MODEL.RETINANET.OCTAVE,
        retina_scales_per_octave=cfg.MODEL.RETINANET.SCALES_PER_OCTAVE,
        retina_fg_iou=cfg.MODEL.RETINANET.FG_IOU_THRESHOLD,
        retina_bg_iou=cfg.MODEL.RETINANET.BG_IOU_THRESHOLD,
        retina_inference_th=cfg.MODEL.RETINANET.INFERENCE_TH,
        retina_pre_nms_top_n=cfg.MODEL.RETINANET.PRE_NMS_TOP_N,
        retina_nms_th=cfg.MODEL.RETINANET.NMS_TH,
        retina_num_convs=cfg.MODEL.RETINANET.NUM_CONVS,
        retina_prior_prob=cfg.MODEL.RETINANET.PRIOR_PROB,
        fpn_strides=tuple(cfg.MODEL.FCOS.FPN_STRIDES),
        dense_points=cfg.MODEL.FCOS.DENSE_POINTS,
        num_convs=cfg.MODEL.FCOS.NUM_CONVS,
        prior_prob=cfg.MODEL.FCOS.PRIOR_PROB,
        center_sample=cfg.MODEL.FCOS.CENTER_SAMPLE,
        pos_radius=cfg.MODEL.FCOS.POS_RADIUS,
        loc_loss_type=cfg.MODEL.FCOS.LOC_LOSS_TYPE,
        loss_gamma=cfg.MODEL.FCOS.LOSS_GAMMA,
        loss_alpha=cfg.MODEL.FCOS.LOSS_ALPHA,
        focal_mode=cfg.LOSS.FOCAL_LOSS,
        score_mode=cfg.LOSS.CLS_LOSS,
        rpn_only=cfg.MODEL.RPN_ONLY,
        pre_nms_top_n_train=cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN,
        pre_nms_top_n_test=cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST,
        rpn_nms_thresh=cfg.MODEL.RPN.NMS_THRESH,
        fpn_post_nms_top_n_train=cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TRAIN,
        fpn_post_nms_top_n_test=cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST,
        nms_pre_topk=cfg.TPU.NMS_PRE_TOPK,
        strict_level_topk=cfg.TPU.STRICT_LEVEL_TOPK,
        inference_th=cfg.MODEL.FCOS.INFERENCE_TH,
        fcos_nms_th=cfg.MODEL.FCOS.NMS_TH,
        fcos_pre_nms_top_n=cfg.MODEL.FCOS.PRE_NMS_TOP_N,
        detections_per_img_rpn_only=cfg.TEST.DETECTIONS_PER_IMG,
        pooler_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
        pooler_scales=tuple(cfg.MODEL.ROI_BOX_HEAD.POOLER_SCALES),
        pooler_sampling_ratio=cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO,
        mlp_head_dim=cfg.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM,
        second_stage_method=cfg.FEW_SHOT.SECOND_STAGE_METHOD,
        second_stage_cls_loss=cfg.FEW_SHOT.SECOND_STAGE_CLS_LOSS,
        linear_fusion=cfg.FEW_SHOT.LINEAR_FUSION,
        neg_support=cfg.FEW_SHOT.NEG_SUPPORT.TURN_ON,
        cls_agnostic_bbox_reg=cfg.MODEL.CLS_AGNOSTIC_BBOX_REG,
        bbox_reg_weights=tuple(cfg.MODEL.ROI_HEADS.BBOX_REG_WEIGHTS),
        roi_batch_size_per_image=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
        roi_positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
        roi_fg_iou=cfg.MODEL.ROI_HEADS.FG_IOU_THRESHOLD,
        roi_bg_iou=cfg.MODEL.ROI_HEADS.BG_IOU_THRESHOLD,
        roi_score_thresh=cfg.MODEL.ROI_HEADS.SCORE_THRESH,
        roi_nms_thresh=cfg.MODEL.ROI_HEADS.NMS,
        roi_detections_per_img=cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG,
        eval_roi_topk=cfg.TPU.EVAL_ROI_TOPK,
        mask_on=cfg.MODEL.MASK_ON,
        keypoint_on=cfg.MODEL.KEYPOINT_ON,
        mask_pooler_resolution=cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION,
        mask_pooler_scales=tuple(cfg.MODEL.ROI_MASK_HEAD.POOLER_SCALES),
        # reference's 0 = adaptive ceil(roi/pooled) sampling is dynamic; the
        # static kernels use the FPN yamls' fixed 2-sample grid instead
        mask_pooler_sampling_ratio=cfg.MODEL.ROI_MASK_HEAD.POOLER_SAMPLING_RATIO or 2,
        mask_conv_layers=tuple(cfg.MODEL.ROI_MASK_HEAD.CONV_LAYERS),
        postprocess_masks=cfg.MODEL.ROI_MASK_HEAD.POSTPROCESS_MASKS,
        postprocess_masks_threshold=cfg.MODEL.ROI_MASK_HEAD.POSTPROCESS_MASKS_THRESHOLD,
        kp_pooler_resolution=cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_RESOLUTION,
        kp_pooler_scales=tuple(cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_SCALES),
        kp_pooler_sampling_ratio=cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_SAMPLING_RATIO or 2,
        kp_conv_layers=tuple(cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_LAYERS),
        num_keypoints=cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_CLASSES,
        mask_raster=cfg.TPU.MASK_RASTER,
        add_artificial_proposals=cfg.FEW_SHOT.ADD_ARTIFICIAL_PROPOSALS,
        num_shot=cfg.FEW_SHOT.NUM_SHOT,
        supp_aug=cfg.FEW_SHOT.SUPP_AUG,
        num_supp_aug=cfg.FEW_SHOT.NUM_SUPP_AUG,
        supp_aug_method=cfg.FEW_SHOT.SUPP_AUG_METHOD,
        supp_roialign=cfg.FEW_SHOT.SUPP_ROIALIGN,
        max_gt=cfg.TPU.MAX_GT_BOXES,
        remat_backbone=cfg.TPU.REMAT_BACKBONE,
        quant=cfg.TPU.QUANT,
        soft_labeling=cfg.FEW_SHOT.SOFT_LABELING,
        soft_labeling_func=cfg.FEW_SHOT.SOFT_LABELING_FUNC,
        reverse_order=cfg.FEW_SHOT.REVERSE_ORDER,
        loss_weighted=cfg.FEW_SHOT.LOSS_WEIGHTED,
    )


def _whole_image_rois(sizes_hw: jnp.ndarray) -> jnp.ndarray:
    """(N, 2) true (h, w) -> (N, 5) rois (idx, 0, 0, w, h)."""
    n = sizes_hw.shape[0]
    idx = jnp.arange(n, dtype=jnp.float32)[:, None]
    zeros = jnp.zeros((n, 2), jnp.float32)
    wh = sizes_hw[:, ::-1]
    return jnp.concatenate([idx, zeros, wh], axis=1)


class GeneralizedRCNN(nn.Module):
    """The full one-shot detector. See module docstring."""

    config: DetectorConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.config
        # remat trades backbone activation memory for recompute in the
        # backward pass (jax.checkpoint) — enables larger train batches
        backbone_cls = nn.remat(ResNetFPN) if c.remat_backbone else ResNetFPN
        self.backbone = backbone_cls(
            depth=c.depth, out_channels=c.out_channels,
            use_c5_for_p6=c.use_c5_for_p6, dtype=self.dtype, quant=c.quant,
            name="backbone",
        )
        if c.siamese_backbone:
            self.supp_backbone = backbone_cls(
                depth=c.depth, out_channels=c.out_channels,
                use_c5_for_p6=c.use_c5_for_p6, dtype=self.dtype, quant=c.quant,
                name="supp_backbone",
            )
        if c.supp_aug and c.supp_aug_method == "conv":
            # 3x3 conv merging the aug variants' channels (ref :75-80)
            self.supp_aug_conv = nn.Conv(
                c.out_channels, (3, 3), padding="SAME", use_bias=False,
                dtype=self.dtype, name="supp_aug_conv",
            )
        # stage-1 dispatch (build_rpn, ref rpn.py:201-210)
        if c.stage1 == "fcos":
            self.fcos_head = FCOSHead(
                num_convs=c.num_convs, num_classes=1, prior_prob=c.prior_prob,
                num_levels=len(c.fpn_strides), dense_points=c.dense_points,
                dtype=self.dtype, quant=c.quant, name="fcos_head",
            )
        elif c.stage1 == "retinanet":
            from .retinanet import RetinaNetModule

            self.retinanet_module = RetinaNetModule(
                num_classes=c.retina_num_classes,
                anchor_sizes=c.retina_anchor_sizes,
                anchor_strides=c.retina_anchor_strides,
                aspect_ratios=c.retina_aspect_ratios,
                octave=c.retina_octave,
                scales_per_octave=c.retina_scales_per_octave,
                fg_iou=c.retina_fg_iou, bg_iou=c.retina_bg_iou,
                inference_th=c.retina_inference_th,
                pre_nms_top_n=min(c.retina_pre_nms_top_n, c.nms_pre_topk),
                nms_thresh=c.retina_nms_th,
                detections_per_img=c.fpn_post_nms_top_n_test,
                dtype=self.dtype, quant=c.quant, name="retinanet_module",
            )
        else:
            from .rpn import RPNModule

            # ANCHOR_STRIDE has one entry per pyramid level; the C4 default
            # (16,) only matches single-level features (ref anchor_generator
            # asserts the same)
            self.rpn_module = RPNModule(
                anchor_sizes=c.rpn_anchor_sizes,
                aspect_ratios=c.rpn_aspect_ratios,
                anchor_strides=c.rpn_anchor_stride,
                straddle_thresh=c.rpn_straddle_thresh,
                fg_iou=c.rpn_fg_iou, bg_iou=c.rpn_bg_iou,
                batch_per_image=c.rpn_batch_per_image,
                positive_fraction=c.rpn_positive_fraction,
                pre_nms_top_n=c.pre_nms_top_n_test,
                post_nms_top_n=c.rpn_post_nms_top_n_test,
                pre_nms_top_n_train=c.pre_nms_top_n_train,
                post_nms_top_n_train=c.rpn_post_nms_top_n_train,
                fpn_post_nms_top_n_train=c.fpn_post_nms_top_n_train,
                fpn_post_nms_top_n=c.fpn_post_nms_top_n_test,
                nms_thresh=c.rpn_nms_thresh,
                min_size=c.rpn_min_size,
                dtype=self.dtype, name="rpn_module",
            )
        if not c.rpn_only:
            ncls, nreg = predictor_num_classes(
                c.second_stage_method, c.second_stage_cls_loss, c.neg_support
            )
            self.roi_head = ROIBoxHeadNet(
                in_channels=c.out_channels, resolution=c.pooler_resolution,
                representation_size=c.mlp_head_dim, num_classes=ncls,
                num_bbox_reg=nreg, linear_fusion=c.linear_fusion,
                dtype=self.dtype, quant=c.quant, name="roi_head",
            )
            # optional mask / keypoint heads (MODEL.MASK_ON / KEYPOINT_ON,
            # CombinedROIHeads in the reference, roi_heads.py:29-55)
            if c.mask_on:
                from .mask_head import MaskHead, MaskRCNNFPNFeatureExtractor  # noqa: F401

                self.mask_head = MaskHead(
                    num_classes=ncls, conv_layers=c.mask_conv_layers,
                    dtype=self.dtype, quant=c.quant, name="mask_head",
                )
            if c.keypoint_on:
                from .keypoint_head import KeypointHead

                self.keypoint_head = KeypointHead(
                    num_keypoints=c.num_keypoints, conv_layers=c.kp_conv_layers,
                    dtype=self.dtype, quant=c.quant, name="keypoint_head",
                )

    # -- helpers ----------------------------------------------------------

    def _supp_features(self, supp: ImageBatch):
        from ..parallel.sharding import batch_only_constraints

        c = self.config
        # supports are small crops sharded over the data axis only — the
        # 2-D mesh's spatial (H) constraints apply to the QUERY pyramid;
        # the support pass pins batch-dim-only shardings instead
        # (parallel/sharding.py::batch_only_constraints).
        with batch_only_constraints():
            if c.siamese_backbone:
                feats = self.supp_backbone(supp.pixels)
            else:
                feats = self.backbone(supp.pixels)
        return self._merge_supp_aug(feats)

    def _merge_supp_aug(self, feats):
        """SUPP_AUG_METHOD merge of the (1 + NUM_SUPP_AUG) augmented variants
        of each support into one feature map per (image, shot) group
        (ref generalized_rcnn.py:280-294; 'conv' path supp_aug_conv :75-80).
        Input per level: (B*shot*aug, H, W, C) -> (B*shot, H, W, C)."""
        c = self.config
        if not c.supp_aug:
            return feats
        a = 1 + c.num_supp_aug
        out = []
        for f in feats:
            n, h, w, ch = f.shape
            g = f.reshape(n // a, a, h, w, ch)
            if c.supp_aug_method == "avg":
                out.append(g.mean(axis=1))
            elif c.supp_aug_method == "max":
                out.append(g.max(axis=1))
            elif c.supp_aug_method == "conv":
                # channel-concat the aug variants (aug-major, torch
                # magic_combine order) then 3x3 conv aug*C -> C (no bias)
                stacked = g.transpose(0, 2, 3, 1, 4).reshape(n // a, h, w, a * ch)
                out.append(self.supp_aug_conv(stacked))
            else:
                raise ValueError(c.supp_aug_method)
        return out

    def _fuse(self, features, features_supp, supp_sizes_hw, batch_size):
        """1x1 supp pooling + shot-average + channel-multiply (ref :296-311)."""
        c = self.config
        rois = _whole_image_rois(supp_sizes_hw)  # (B*shot, 5)
        combined = []
        for lvl, (f, fs) in enumerate(zip(features, features_supp)):
            if c.supp_roialign:
                pooled = roi_align(
                    fs, rois, (1, 1), c.pooler_scales[lvl], c.pooler_sampling_ratio
                )  # (B*shot, 1, 1, C)
            else:
                pooled = fs.mean(axis=(1, 2), keepdims=True)
            shot = pooled.shape[0] // batch_size
            pooled = pooled.reshape(batch_size, shot, 1, 1, -1).mean(axis=1)
            combined.append(f * pooled.astype(f.dtype))
        return combined

    def _pool_rois(self, features, boxes: Boxes, use_pallas: bool = False):
        """Multi-level 7x7 pooling of batched padded Boxes -> (B*P, 7, 7, C).

        Uses the Pallas windowed-DMA kernel on TPU (ops/pallas_roi_align.py);
        falls back to the XLA gather formulation elsewhere (CPU tests,
        interpret-mode debugging).
        """
        c = self.config
        b, p = boxes.valid.shape
        flat_xyxy = boxes.xyxy.reshape(-1, 4)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), p)[:, None]
        rois = jnp.concatenate([batch_idx, flat_xyxy], axis=1)
        k_min = 3  # -log2(1/8)
        k_max = k_min + len(c.pooler_scales) - 1
        levels = fpn_level_map(flat_xyxy, k_min, k_max) if len(c.pooler_scales) > 1 else jnp.zeros(
            (b * p,), jnp.int32
        )
        # the Pallas kernel is forward-only: eval path only
        from ..ops.pallas_roi_align import pallas_enabled

        if use_pallas and pallas_enabled():
            from ..ops.pallas_roi_align import pallas_multilevel_roi_align

            return pallas_multilevel_roi_align(
                features, rois, levels,
                (c.pooler_resolution, c.pooler_resolution),
                c.pooler_scales, c.pooler_sampling_ratio,
                valid=boxes.valid.reshape(-1),
            )
        return multilevel_roi_align(
            features, rois, levels,
            (c.pooler_resolution, c.pooler_resolution),
            c.pooler_scales, c.pooler_sampling_ratio,
        )

    def _compact_eval_proposals(self, proposals: Boxes) -> Boxes:
        """Opt-in stage-2 workload cut (TPU.EVAL_ROI_TOPK): keep only the
        top-K proposals before ROIAlign + the ROI head. Stage-1 postprocess
        outputs are score-sorted descending (final lax.top_k), so this is a
        static truncate of the lowest-ranked / padded slots. 2000 ROIs/img at
        ~63 MFLOP/ROI dominate eval (~30 of 67 ms incl. pooling); drift vs
        the full capacity is measured by tests/test_roi_compaction.py and
        tools/ablate_bench.py."""
        k = self.config.eval_roi_topk
        if k and k < proposals.capacity:
            from .roi_head import truncate_boxes

            return truncate_boxes(proposals, k)
        return proposals

    def _eval_roi_pool(self, features, proposals: Boxes):
        """Eval-time ROI pooling, optionally with the compress_0 query-half
        matmul hoisted to full-map cost (ONESHOT_PREPOOL_COMPRESS=1).

        The head's only use of raw pooled query features is the 1x1
        compress_0 query matmul (roi_head.py _ConcatConv1x1) — a per-channel
        linear map, which commutes exactly with bilinear ROI pooling. At 16k
        ROIs x 49 positions that matmul is ~410 GFLOP/batch; on the ~21k
        full-map positions it is ~44 GFLOP, and the pooled-256 intermediate
        write+read disappears. The price is pooling 2C channels instead of
        C. Returns (roi_feats, prepooled_query) — exactly one is non-None.
        """
        import os

        c = self.config
        use_prepool = (
            os.environ.get("ONESHOT_PREPOOL_COMPRESS") == "1"
            and not c.linear_fusion
            and not self.is_initializing()
        )
        if not use_prepool:
            return self._pool_rois(features, proposals, use_pallas=True), None
        k0 = self.variables["params"]["roi_head"]["compress_0"]["kernel"]
        ka = jnp.asarray(k0)[0, 0, : c.out_channels]
        if c.quant == "int8":
            from ..ops.quant import int8_dot

            ya_maps = [int8_dot(f, ka).astype(self.dtype) for f in features]
        else:
            ya_maps = [
                jnp.einsum("bhwc,cf->bhwf", f.astype(self.dtype),
                           ka.astype(self.dtype))
                for f in features
            ]
        return None, self._pool_rois(ya_maps, proposals, use_pallas=True)

    def _pool_rois_at(self, features, boxes: Boxes, resolution: int,
                      scales: Tuple[float, ...], sampling_ratio: int):
        """Pool batched padded Boxes at an arbitrary (resolution, scales) —
        the mask/keypoint pooler surface (ref poolers.py via
        make_pooler(cfg, 'ROI_MASK_HEAD'/'ROI_KEYPOINT_HEAD'))."""
        import math

        b, p = boxes.valid.shape
        flat_xyxy = boxes.xyxy.reshape(-1, 4)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), p)[:, None]
        rois = jnp.concatenate([batch_idx, flat_xyxy], axis=1)
        # select the pyramid sublist matching the requested scales
        lvl_of = [int(round(-math.log2(s))) - 3 for s in scales]
        feats = [features[i] for i in lvl_of]
        if len(scales) > 1:
            k_min = lvl_of[0] + 3
            levels = fpn_level_map(flat_xyxy, k_min, k_min + len(scales) - 1)
        else:
            levels = jnp.zeros((b * p,), jnp.int32)
        return multilevel_roi_align(
            feats, rois, levels, (resolution, resolution), tuple(scales),
            sampling_ratio,
        )

    def _supp_roi_7x7(self, features_supp, supp_sizes_hw, batch_size):
        """Whole-support 7x7 features for stage 2 (supproi_pooling.py:42-73).

        Returns (B, shot, 7, 7, C): the reference keeps shots separate and
        the box head loops them — training uses shot 0 (the loop returns in
        its first iteration, box_head.py:180-201) and eval max-merges the
        per-shot logits (:241-256).
        """
        c = self.config
        rois5 = _whole_image_rois(supp_sizes_hw)
        wh = supp_sizes_hw[:, ::-1]
        whole = jnp.concatenate([jnp.zeros_like(wh), wh], axis=1)  # (N, 4)
        k_min = 3
        k_max = k_min + len(c.pooler_scales) - 1
        levels = fpn_level_map(whole, k_min, k_max)
        pooled = multilevel_roi_align(
            features_supp, rois5, levels,
            (c.pooler_resolution, c.pooler_resolution),
            c.pooler_scales, c.pooler_sampling_ratio,
        )  # (B*shot, 7, 7, C)
        shot = pooled.shape[0] // batch_size
        r = c.pooler_resolution
        return pooled.reshape(batch_size, shot, r, r, -1)

    def _roi_head_multi_shot(self, roi_feats, supp_7x7, use_pallas=False,
                             prepooled_query=None):
        """Eval-time multi-support merge (box_head.py:118-124, 241-256):
        run the relation head once per support shot and take the
        element-wise max over class logits; each class slot's box deltas
        follow the winning shot for that slot."""
        shot = supp_7x7.shape[1]
        if shot == 1:
            return self.roi_head(roi_feats, supp_7x7[:, 0], use_pallas,
                                 prepooled_query)
        logits_all, regs_all = [], []
        for s in range(shot):
            lg, rg = self.roi_head(roi_feats, supp_7x7[:, s], use_pallas,
                                   prepooled_query)
            logits_all.append(lg)
            regs_all.append(rg)
        logits = jnp.stack(logits_all)      # (S, N, ncls)
        regs = jnp.stack(regs_all)          # (S, N, 4*nreg)
        cls_idx = jnp.argmax(logits, axis=0)             # (N, ncls)
        merged_logits = jnp.max(logits, axis=0)
        n, ncls = cls_idx.shape
        if regs.shape[-1] == 4 * ncls:
            box_idx = jnp.repeat(cls_idx, 4, axis=-1)    # (N, 4*ncls)
        else:  # reg slots don't align with class slots: follow class 0
            box_idx = jnp.broadcast_to(cls_idx[:, :1], (n, regs.shape[-1]))
        merged_regs = jnp.take_along_axis(regs, box_idx[None], axis=0)[0]
        return merged_logits, merged_regs

    def _mask_kp_eval(self, features, dets: Boxes) -> Boxes:
        """Eval-time mask/keypoint predictions over the final detections
        (ref roi_heads.py test flow + mask_head/inference.py: sigmoid + the
        detection's class channel; Masker paste-back runs on host at the API
        boundary when POSTPROCESS_MASKS)."""
        c = self.config
        if not (c.mask_on or c.keypoint_on):
            return dets
        b, k = dets.valid.shape
        if c.mask_on:
            feats = self._pool_rois_at(
                features, dets, c.mask_pooler_resolution,
                c.mask_pooler_scales, c.mask_pooler_sampling_ratio,
            )
            logits = self.mask_head(feats.astype(self.dtype))  # (BK, h, w, ncls)
            ch = min(1, logits.shape[-1] - 1)  # one-shot: the fg class slot
            probs = jax.nn.sigmoid(logits[..., ch].astype(jnp.float32))
            dets = dets.with_field(
                "mask_probs", probs.reshape((b, k) + probs.shape[1:])
            )
        if c.keypoint_on:
            from .keypoint_head import heatmaps_to_keypoints

            feats = self._pool_rois_at(
                features, dets, c.kp_pooler_resolution,
                c.kp_pooler_scales, c.kp_pooler_sampling_ratio,
            )
            logits = self.keypoint_head(feats.astype(self.dtype))
            xy, scores = heatmaps_to_keypoints(
                logits.astype(jnp.float32), dets.xyxy.reshape(-1, 4)
            )
            dets = dets.with_field(
                "keypoints_xy", xy.reshape(b, k, -1, 2)
            ).with_field("keypoints_scores", scores.reshape(b, k, -1))
        return dets

    # -- streaming-predictor support caching --------------------------------

    def compute_support_features(self, images_supp: ImageBatch, batch_size: int = 1):
        """Run the support branch once; returns (pooled_1x1 per level, supp_7x7).

        The reference's demo path never supported the Siamese forward
        (predictor.py:205 calls model(image_list) single-arg — SURVEY §3.4);
        this is the fixed design: support features are computed once per
        class and reused across frames.
        """
        c = self.config
        features_supp = self._supp_features(images_supp)
        supp_sizes = (
            images_supp.sizes[:: 1 + c.num_supp_aug] if c.supp_aug
            else images_supp.sizes
        )
        rois = _whole_image_rois(supp_sizes)
        pooled = []
        for lvl, fs in enumerate(features_supp):
            if c.supp_roialign:
                p = roi_align(fs, rois, (1, 1), c.pooler_scales[lvl], c.pooler_sampling_ratio)
            else:
                p = fs.mean(axis=(1, 2), keepdims=True)
            shot = p.shape[0] // batch_size
            pooled.append(p.reshape(batch_size, shot, 1, 1, -1).mean(axis=1))
        supp_7x7 = self._supp_roi_7x7(features_supp, supp_sizes, batch_size)
        return pooled, supp_7x7

    def backbone_features(self, images: ImageBatch):
        """Query backbone+FPN pass alone.

        The reference runs the query backbone BEFORE fusion
        (generalized_rcnn.py:270 vs :307-311), so one backbone pass can
        legally serve any number of support classes; this factoring is what
        ``detect_from_features`` / the multi-class eval step build on.
        """
        return self.backbone(images.pixels.astype(self.dtype))

    def detect_with_support(
        self,
        images: ImageBatch,
        supp_pooled,          # list of (B, 1, 1, C) per level
        supp_7x7,             # (B, shot, 7, 7, C)
        target_ids=None,
    ):
        """Eval forward with precomputed (cached) support features."""
        features = self.backbone_features(images)
        return self.detect_from_features(
            features, images.sizes_wh(), supp_pooled, supp_7x7, target_ids
        )

    def detect_from_features(
        self,
        features,             # query FPN pyramid, each (B, H, W, C)
        sizes_wh,             # (B, 2) true image (w, h)
        supp_pooled,          # list of (B or 1, 1, 1, C) per level
        supp_7x7,             # (B or 1, shot, 7, 7, C)
        target_ids=None,      # (B,) int, or a scalar for a class-level id
    ):
        """Post-backbone eval path: fusion -> stage 1 -> stage 2 -> postproc.

        Support inputs with a leading dim of 1 are class-level features
        broadcast across the query batch — the multi-class episode protocol
        (the eval dataset revisits each query image once per class,
        ref data/datasets/coco.py:181-203) scans this method over S cached
        support sets off ONE ``backbone_features`` pass.
        """
        c = self.config
        b = features[0].shape[0]
        supp_7x7 = jnp.broadcast_to(supp_7x7, (b,) + supp_7x7.shape[1:])
        if target_ids is None:
            target_ids = jnp.ones((b,), jnp.int32)
        else:
            target_ids = jnp.broadcast_to(jnp.asarray(target_ids, jnp.int32)
                                          .reshape(-1), (b,))
        combined = [f * p.astype(f.dtype) for f, p in zip(features, supp_pooled)]
        if c.stage1 == "fcos":
            logits, bbox_reg, ctrness = self.fcos_head(combined)
            shapes = [(f.shape[1], f.shape[2]) for f in combined]
            locations = compute_locations(shapes, c.fpn_strides, c.dense_points)
            proposals = fcos_postprocess(
                locations, logits, bbox_reg, ctrness, sizes_wh,
                c.pre_nms_top_n_test, c.rpn_nms_thresh, c.fpn_post_nms_top_n_test,
                c.nms_pre_topk, 0.0, c.score_mode,
                level_topk=c.strict_level_topk,
                dense_points=c.dense_points,
            )
        elif c.stage1 == "retinanet":
            proposals, _ = self.retinanet_module(combined, sizes_wh)
        else:
            proposals, _ = self.rpn_module(combined, sizes_wh)
        if c.rpn_only:
            return proposals
        proposals = self._compact_eval_proposals(proposals)
        roi_feats, prepooled = self._eval_roi_pool(features, proposals)
        # per-image support: roi_head broadcasts internally (image-major ROIs)
        cls_logits, box_deltas = self._roi_head_multi_shot(
            None if roi_feats is None else roi_feats.astype(self.dtype),
            supp_7x7.astype(self.dtype),
            use_pallas=True, prepooled_query=prepooled,
        )
        dets = roi_head_postprocess(
            cls_logits, box_deltas, proposals, target_ids,
            BoxCoder(c.bbox_reg_weights), c.roi_score_thresh,
            c.roi_nms_thresh, c.roi_detections_per_img,
            c.second_stage_cls_loss,
        )
        return self._mask_kp_eval(features, dets)

    # -- forward ----------------------------------------------------------

    def __call__(
        self,
        images: ImageBatch,
        images_supp: ImageBatch,
        targets: Optional[Boxes] = None,
        target_ids: Optional[jnp.ndarray] = None,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        images_neg_supp: Optional[ImageBatch] = None,
    ):
        """Returns a dict of losses (train) or detection Boxes (eval)."""
        c = self.config
        if train and c.quant != "none":
            # jnp.round's gradient is zero — the int8 path is inference-only
            raise ValueError(
                "TPU.QUANT is an eval-time flag; train with TPU.QUANT='none'")
        b = images.batch_size

        features = self.backbone(images.pixels.astype(self.dtype))
        features_supp = self._supp_features(images_supp)
        # after aug-merge one size per (image, shot) group (ref :233-241
        # keeps every aug_num-th size; aug variants share their source size)
        supp_sizes = (
            images_supp.sizes[:: 1 + c.num_supp_aug] if c.supp_aug
            else images_supp.sizes
        )

        combined = self._fuse(features, features_supp, supp_sizes, b)

        losses = {}
        if c.stage1 == "fcos":
            logits, bbox_reg, ctrness = self.fcos_head(combined)
            shapes = [(f.shape[1], f.shape[2]) for f in combined]
            locations = compute_locations(shapes, c.fpn_strides, c.dense_points)

            if train:
                assert targets is not None and rng is not None
                labels, reg_targets = fcos_targets(
                    locations, c.fpn_strides, targets.xyxy,
                    targets.get_field("labels"), targets.valid,
                    c.center_sample, c.pos_radius,
                )
                loss_cls, loss_reg, loss_ctr = fcos_losses(
                    logits, bbox_reg, ctrness, labels, reg_targets,
                    c.loss_gamma, c.loss_alpha, c.loc_loss_type, c.focal_mode,
                    dense_points=c.dense_points,
                )
                losses.update(
                    loss_cls=loss_cls, loss_reg=loss_reg, loss_centerness=loss_ctr
                )

            if c.rpn_only:
                if train:
                    return losses
                return fcos_postprocess(
                    locations, logits, bbox_reg, ctrness, images.sizes_wh(),
                    c.fcos_pre_nms_top_n, c.fcos_nms_th,
                    c.detections_per_img_rpn_only, c.nms_pre_topk,
                    c.inference_th, c.score_mode,
                    level_topk=c.strict_level_topk,
                dense_points=c.dense_points,
                )

            # proposals (box_selector under no_grad in the reference, :196-199)
            pre_n = c.pre_nms_top_n_train if train else c.pre_nms_top_n_test
            post_n = c.fpn_post_nms_top_n_train if train else c.fpn_post_nms_top_n_test
            proposals = fcos_postprocess(
                [jax.lax.stop_gradient(l) for l in locations],
                [jax.lax.stop_gradient(x) for x in logits],
                [jax.lax.stop_gradient(x) for x in bbox_reg],
                [jax.lax.stop_gradient(x) for x in ctrness],
                images.sizes_wh(), pre_n, c.rpn_nms_thresh, post_n,
                c.nms_pre_topk, 0.0, c.score_mode,
                level_topk=c.strict_level_topk,
                dense_points=c.dense_points,
            )
        else:
            # anchor RPN / RetinaNet stage 1 (build_rpn dispatch,
            # ref rpn.py:201-210)
            if c.stage1 == "retinanet":
                proposals, s1_losses = self.retinanet_module(
                    combined, images.sizes_wh(), targets=targets, train=train,
                )
            else:
                rng_s1 = jax.random.fold_in(rng, 7) if rng is not None else None
                proposals, s1_losses = self.rpn_module(
                    combined, images.sizes_wh(), targets=targets, train=train,
                    rng=rng_s1,
                )
            losses.update(s1_losses)
            if c.rpn_only or proposals is None:
                # RetinaNet trains stage 1 only (the reference hands raw
                # anchors to downstream code, retinanet.py:136-144 — only
                # meaningful with RPN_ONLY); eval returns its detections
                if train:
                    return losses
                return proposals

        # stage-2 whole-support features, (B, shot, 7, 7, C)
        supp_7x7 = self._supp_roi_7x7(features_supp, supp_sizes, b)

        if train:
            # append gt boxes to proposals (inference.py:139-160)
            gt_as_props = Boxes(
                xyxy=targets.xyxy, valid=targets.valid, size=targets.size,
                fields={
                    "scores": jnp.where(targets.valid, 1.0, 0.0),
                    "objectness": jnp.where(targets.valid, 1.0, 0.0),
                },
            )
            if c.add_artificial_proposals:
                # IoU-binned jittered GT boxes lead, then the GTs, then the
                # scored proposals, capped at 1000 REAL boxes — compaction
                # first, because the reference's proposal[:1000] counts real
                # boxes, not padded capacity slots
                # (generalized_rcnn.py:106-204; toggle inference.py:273-279)
                from .roi_head import (
                    compact_boxes, make_artificial_proposals, truncate_boxes,
                )

                art = make_artificial_proposals(
                    jax.random.fold_in(rng, 3), gt_as_props
                )
                proposals = truncate_boxes(
                    compact_boxes(
                        cat_boxes(cat_boxes(art, gt_as_props), proposals)
                    ),
                    1000,
                )
            else:
                proposals = cat_boxes(proposals, gt_as_props)

            rng_sample = jax.random.fold_in(rng, 1)
            prep = prepare_roi_targets(
                rng_sample, proposals, targets, BoxCoder(c.bbox_reg_weights),
                c.roi_batch_size_per_image, c.roi_positive_fraction,
                c.roi_fg_iou, c.roi_bg_iou,
                soft_labeling=c.soft_labeling,
                soft_labeling_func=c.soft_labeling_func,
            )
            soft_labels = None
            if c.soft_labeling:
                idx, s_valid, roi_labels, roi_reg_t, gt_idx, soft_labels = prep
            else:
                idx, s_valid, roi_labels, roi_reg_t, gt_idx = prep
            sampled = Boxes(
                xyxy=jnp.take_along_axis(proposals.xyxy, idx[..., None], axis=1),
                valid=s_valid,
                size=proposals.size,
                fields={},
            )
            roi_feats = self._pool_rois(features, sampled)
            n = roi_feats.shape[0]
            r = c.pooler_resolution
            # training uses shot 0 (the reference's shot loop returns from
            # its first iteration, box_head.py:180-201)
            supp_s0 = supp_7x7[:, 0]
            cls_logits, box_deltas = self.roi_head(
                roi_feats.astype(self.dtype), supp_s0.astype(self.dtype)
            )
            rev_logits = neg_logits = None
            if c.reverse_order:
                # swapped concat order pass (box_head.py:143-171): the
                # support side leads, so it must be expanded to per-ROI
                supp_exp = jnp.broadcast_to(
                    supp_s0[:, None], (b, n // b, r, r, supp_s0.shape[-1])
                ).reshape(n, r, r, -1)
                rev_logits, _ = self.roi_head(
                    supp_exp.astype(self.dtype), roi_feats.astype(self.dtype)
                )
            if c.neg_support and images_neg_supp is not None:
                feats_neg = self._supp_features(images_neg_supp)
                neg_sizes = (
                    images_neg_supp.sizes[:: 1 + c.num_supp_aug] if c.supp_aug
                    else images_neg_supp.sizes
                )
                neg_7x7 = self._supp_roi_7x7(feats_neg, neg_sizes, b)
                neg_logits, _ = self.roi_head(
                    roi_feats.astype(self.dtype), neg_7x7[:, 0].astype(self.dtype)
                )
            out = roi_head_loss(
                cls_logits, box_deltas, roi_labels, roi_reg_t, s_valid,
                c.second_stage_cls_loss, c.loss_gamma, c.loss_alpha,
                c.cls_agnostic_bbox_reg,
                soft_labels=soft_labels, loss_weighted=c.loss_weighted,
                neg_logits=neg_logits, rev_logits=rev_logits,
            )
            # x5 / x2.5 weights (box_head.py:184-195)
            if c.reverse_order:
                loss_classifier, loss_box_reg, rev_loss = out
                losses.update(loss_reverse=rev_loss)
            elif neg_logits is not None:
                loss_classifier, loss_box_reg, suppress = out
                losses.update(loss_cls_suppress=suppress * 2.5)
            else:
                loss_classifier, loss_box_reg = out
            losses.update(
                loss_classifier=loss_classifier * 5.0,
                loss_box_reg=loss_box_reg * 2.5,
            )

            # mask / keypoint heads over the same sampled proposals
            # (CombinedROIHeads train flow, ref roi_heads.py:29-55; loss is
            # positive-weighted so padded/negative rows contribute zero)
            labels_flat = roi_labels.reshape(-1)
            valid_flat = s_valid.reshape(-1)
            if c.mask_on:
                from .mask_head import mask_head_loss, project_gt_rasters

                mask_feats = self._pool_rois_at(
                    features, sampled, c.mask_pooler_resolution,
                    c.mask_pooler_scales, c.mask_pooler_sampling_ratio,
                )
                mask_logits = self.mask_head(mask_feats.astype(self.dtype))
                rasters = targets.get_field("masks")         # (B, G, S, S)
                sel_rast = jnp.take_along_axis(
                    rasters, gt_idx[..., None, None], axis=1
                ).reshape((-1,) + rasters.shape[2:])
                sel_gt = jnp.take_along_axis(
                    targets.xyxy, gt_idx[..., None], axis=1
                ).reshape(-1, 4)
                mask_t = project_gt_rasters(
                    sel_rast, sel_gt, sampled.xyxy.reshape(-1, 4),
                    mask_logits.shape[1],
                )
                losses["loss_mask"] = mask_head_loss(
                    mask_logits, mask_t, labels_flat, valid_flat,
                )
            if c.keypoint_on:
                from .keypoint_head import (
                    keypoint_head_loss,
                    keypoints_to_heatmap_targets,
                )

                kp_feats = self._pool_rois_at(
                    features, sampled, c.kp_pooler_resolution,
                    c.kp_pooler_scales, c.kp_pooler_sampling_ratio,
                )
                kp_logits = self.keypoint_head(kp_feats.astype(self.dtype))
                gt_kps = targets.get_field("keypoints")      # (B, G, K, 3)
                sel_kps = jnp.take_along_axis(
                    gt_kps, gt_idx[..., None, None], axis=1
                ).reshape((-1,) + gt_kps.shape[2:])
                hm_idx, hm_valid = keypoints_to_heatmap_targets(
                    sel_kps, sampled.xyxy.reshape(-1, 4), kp_logits.shape[1]
                )
                hm_valid = hm_valid & ((labels_flat > 0) & valid_flat)[:, None]
                losses["loss_kp"] = keypoint_head_loss(kp_logits, hm_idx, hm_valid)
            return losses

        # eval: score every proposal against the support; multi-shot
        # supports max-merge (box_head.py:241-256)
        proposals = self._compact_eval_proposals(proposals)
        roi_feats, prepooled = self._eval_roi_pool(features, proposals)
        cls_logits, box_deltas = self._roi_head_multi_shot(
            None if roi_feats is None else roi_feats.astype(self.dtype),
            supp_7x7.astype(self.dtype),
            use_pallas=True, prepooled_query=prepooled,
        )
        if target_ids is None:
            target_ids = jnp.ones((b,), jnp.int32)
        dets = roi_head_postprocess(
            cls_logits, box_deltas, proposals, target_ids,
            BoxCoder(c.bbox_reg_weights), c.roi_score_thresh,
            c.roi_nms_thresh, c.roi_detections_per_img,
            c.second_stage_cls_loss,
        )
        return self._mask_kp_eval(features, dets)


def build_detection_model(cfg, dtype=None):
    """Public builder matching the reference API
    (modeling/detector/detectors.py:8-10). Returns a flax Module."""
    import jax.numpy as jnp  # noqa

    if dtype is None:
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.TPU.COMPUTE_DTYPE]
    return GeneralizedRCNN(config=detector_config_from_cfg(cfg), dtype=dtype)
