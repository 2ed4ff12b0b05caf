"""torch state_dict → focoos_tpu variables converter.

This is the weight-porting lever (SURVEY.md §7 hard-part 3): pretrained
reference checkpoints (``model_final.pth``) are mapped to our param pytree by
deterministic name rules — convs transpose OIHW→HWIO (NHWC layout), linears
transpose [out,in]→[in,out], torch ``nn.MultiheadAttention`` in_proj tensors
split into q/k/v kernels, BatchNorm running stats land in ``batch_stats``.

Works on raw numpy state dicts — torch itself is only needed to *read* a
.pth file (tools/convert_torch_weights.py does that part).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Tuple

import numpy as np

from focoos_tpu.utils.checkpoint import unflatten_tree

# transform kinds
def _conv(w):  # OIHW → HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w):  # [out, in] → [in, out]
    return np.transpose(w)


def _id(w):
    return w


Rule = Tuple[str, str, Callable]  # (regex on torch key, '/'-template with \1.., transform)


def _bn_rules(torch_prefix: str, jax_prefix: str) -> List[Rule]:
    """BatchNorm param+stat mapping for a ConvNorm-style `norm` submodule."""
    return [
        (rf"{torch_prefix}\.weight$", f"params/{jax_prefix}/scale", _id),
        (rf"{torch_prefix}\.bias$", f"params/{jax_prefix}/bias", _id),
        (rf"{torch_prefix}\.running_mean$", f"batch_stats/{jax_prefix}/mean", _id),
        (rf"{torch_prefix}\.running_var$", f"batch_stats/{jax_prefix}/var", _id),
    ]


def apply_rules(state: Dict[str, np.ndarray], rules: List[Rule]) -> Tuple[Dict[str, np.ndarray], List[str]]:
    out: Dict[str, np.ndarray] = {}
    unmatched: List[str] = []
    for key, val in state.items():
        if key.endswith(
            ("num_batches_tracked", "dim_t", "x_bins", "y_bins", "relative_position_index")
        ) or key in ("pixel_mean", "pixel_std"):
            continue
        if "criterion" in key or "anchors" in key or "valid_mask" in key:
            continue
        hit = False
        for pat, template, tf in rules:
            m = re.fullmatch(pat, key)
            if m:
                path = template
                for gi, g in enumerate(m.groups(), start=1):
                    path = path.replace(f"\\{gi}", g if g is not None else "")
                out[path] = tf(np.asarray(val))
                hit = True
                break
        if not hit:
            unmatched.append(key)
    return out, unmatched


def expand_mha(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Split torch MultiheadAttention merged in_proj into q/k/v projections."""
    out = {}
    for key, val in flat.items():
        if key.endswith("@in_proj_weight"):
            base = key[: -len("@in_proj_weight")]
            e = val.shape[1]
            out[f"{base}/q_proj/kernel"] = _linear(val[:e])
            out[f"{base}/k_proj/kernel"] = _linear(val[e : 2 * e])
            out[f"{base}/v_proj/kernel"] = _linear(val[2 * e :])
        elif key.endswith("@in_proj_bias"):
            base = key[: -len("@in_proj_bias")]
            e = val.shape[0] // 3
            out[f"{base}/q_proj/bias"] = val[:e]
            out[f"{base}/k_proj/bias"] = val[e : 2 * e]
            out[f"{base}/v_proj/bias"] = val[2 * e :]
        else:
            out[key] = val
    return out


# ---------------------------------------------------------------------------
# shared sub-blocks
# ---------------------------------------------------------------------------


def convnorm_rules(tp: str, jp: str) -> List[Rule]:
    """ConvNormLayer: tp.conv/.norm → jp/conv/kernel + jp/norm/bn/*."""
    return [
        (rf"{tp}\.conv\.weight", f"params/{jp}/conv/kernel", _conv),
        (rf"{tp}\.conv\.bias", f"params/{jp}/conv/bias", _id),
        *_bn_rules(rf"{tp}\.norm", f"{jp}/norm/bn"),
    ]


def mha_rules(tp: str, jp: str) -> List[Rule]:
    return [
        (rf"{tp}\.in_proj_weight", f"{jp}@in_proj_weight", _id),
        (rf"{tp}\.in_proj_bias", f"{jp}@in_proj_bias", _id),
        (rf"{tp}\.out_proj\.weight", f"{jp}/out_proj/kernel", _linear),
        (rf"{tp}\.out_proj\.bias", f"{jp}/out_proj/bias", _id),
    ]


def dense_rules(tp: str, jp: str) -> List[Rule]:
    return [
        (rf"{tp}\.weight", f"params/{jp}/kernel", _linear),
        (rf"{tp}\.bias", f"params/{jp}/bias", _id),
    ]


def ln_rules(tp: str, jp: str) -> List[Rule]:
    return [
        (rf"{tp}\.weight", f"params/{jp}/scale", _id),
        (rf"{tp}\.bias", f"params/{jp}/bias", _id),
    ]


def resnet_rules(tp: str = r"backbone", jp: str = "backbone") -> List[Rule]:
    """ResNet (focoos layout) → focoos_tpu ResNet paths.

    torch: conv1.conv1_1.*, res_layers.{i}.blocks.{j}.branch2x / short /
    short.conv (variant-d Sequential(pool, ConvNormLayer)).
    """
    rules: List[Rule] = []
    rules += convnorm_rules(rf"{tp}\.conv1\.(conv1_\d)", rf"{jp}/\1")

    def stage_sub(m_expr: str) -> str:
        return m_expr  # placeholder for clarity

    # res_layers.i.blocks.j → res{i+2}_block{j}: regex can't add, enumerate stages
    for i in range(4):
        base_t = rf"{tp}\.res_layers\.{i}\.blocks\.(\d+)"
        base_j = rf"{jp}/res{i + 2}_block\1"
        for br in ("branch2a", "branch2b", "branch2c"):
            rules += convnorm_rules(rf"{base_t}\.{br}", rf"{base_j}/{br}")
        # variant-d downsample shortcut: Sequential(pool, conv=ConvNormLayer)
        rules += convnorm_rules(rf"{base_t}\.short\.conv", rf"{base_j}/short_conv")
        # plain shortcut
        rules += convnorm_rules(rf"{base_t}\.short", rf"{base_j}/short")
    return rules


def _convx_rules(tp: str, jp: str) -> List[Rule]:
    """STDC ConvX: conv + bn."""
    return [
        (rf"{tp}\.conv\.weight", f"params/{jp}/conv/kernel", _conv),
        *_bn_rules(rf"{tp}\.bn", f"{jp}/bn"),
    ]


def stdc_rules(tp: str, jp: str) -> List[Rule]:
    """STDC (focoos layout) → focoos_tpu STDC paths.

    torch: features.{i} is ConvX (stem) or Cat/AddBottleneck with
    conv_list.{j}, avd_layer.{0,1}, skip.{0..3}.
    """
    g = re.compile(tp).groups + 1
    rules: List[Rule] = []
    base_t = rf"{tp}\.features\.(\d+)"
    base_j = rf"{jp}/features_\{g}"
    rules += _convx_rules(base_t, base_j)  # stem ConvX
    rules += _convx_rules(rf"{base_t}\.conv_list\.(\d+)", rf"{base_j}/conv_list_\{g + 1}")
    rules += [
        (rf"{base_t}\.avd_layer\.0\.weight", rf"params/{base_j}/avd_conv/kernel", _conv),
        *_bn_rules(rf"{base_t}\.avd_layer\.1", rf"{base_j}/avd_bn"),
        # AddBottleneck skip: Sequential(dw conv, bn, pw conv, bn)
        (rf"{base_t}\.skip\.0\.weight", rf"params/{base_j}/skip_dw/kernel", _conv),
        *_bn_rules(rf"{base_t}\.skip\.1", rf"{base_j}/skip_dw_bn"),
        (rf"{base_t}\.skip\.2\.weight", rf"params/{base_j}/skip_pw/kernel", _conv),
        *_bn_rules(rf"{base_t}\.skip\.3", rf"{base_j}/skip_pw_bn"),
    ]
    return rules


def transformer_encoder_layer_rules(tp: str, jp: str) -> List[Rule]:
    return [
        *mha_rules(rf"{tp}\.self_attn", f"params/{jp}/self_attn"),
        *dense_rules(rf"{tp}\.linear1", f"{jp}/linear1"),
        *dense_rules(rf"{tp}\.linear2", f"{jp}/linear2"),
        *ln_rules(rf"{tp}\.norm1", f"{jp}/norm1"),
        *ln_rules(rf"{tp}\.norm2", f"{jp}/norm2"),
    ]


def csprep_rules(tp: str, jp: str) -> List[Rule]:
    rules = []
    for c in ("conv1", "conv2", "conv3"):
        rules += convnorm_rules(rf"{tp}\.{c}", rf"{jp}/{c}")
    # group number of the bottleneck index depends on how many groups tp has
    g = re.compile(tp).groups + 1
    rules += convnorm_rules(rf"{tp}\.bottlenecks\.(\d+)\.conv1", rf"{jp}/bottlenecks_\{g}/conv1")
    rules += convnorm_rules(rf"{tp}\.bottlenecks\.(\d+)\.conv2", rf"{jp}/bottlenecks_\{g}/conv2")
    return rules


def backbone_rules(tp: str, jp: str) -> List[Rule]:
    """All-backbone rule union — name patterns are disjoint across backbones."""
    return (
        resnet_rules(tp, jp)
        + stdc_rules(tp, jp)
        + convnextv2_rules(tp, jp)
        + mobilenet_v2_rules(tp, jp)
        + swin_rules(tp, jp)
    )


# ---------------------------------------------------------------------------
# fai_detr
# ---------------------------------------------------------------------------


def fai_detr_rules() -> List[Rule]:
    rules: List[Rule] = []
    pd_t, pd_j = r"pixel_decoder", "pixel_decoder"
    # the backbone module is an attribute of FAIDetr shared into the encoder,
    # so flax scopes its params at the top level ("backbone/...")
    rules += backbone_rules(rf"{pd_t}\.backbone", "backbone")

    # channel projection: Sequential(conv, bn)
    rules += [
        (rf"{pd_t}\.input_proj\.(\d+)\.0\.weight", rf"params/{pd_j}/input_proj_\1_conv/kernel", _conv),
        *_bn_rules(rf"{pd_t}\.input_proj\.(\d+)\.1", rf"{pd_j}/input_proj_\1_bn"),
    ]
    rules += transformer_encoder_layer_rules(
        rf"{pd_t}\.encoder\.(\d+)\.layers\.(\d+)", rf"{pd_j}/encoder_\1_layers_\2"
    )
    rules += convnorm_rules(rf"{pd_t}\.lateral_convs\.(\d+)", rf"{pd_j}/lateral_convs_\1")
    rules += csprep_rules(rf"{pd_t}\.fpn_blocks\.(\d+)", rf"{pd_j}/fpn_blocks_\1")
    rules += convnorm_rules(rf"{pd_t}\.downsample_convs\.(\d+)", rf"{pd_j}/downsample_convs_\1")
    rules += csprep_rules(rf"{pd_t}\.pan_blocks\.(\d+)", rf"{pd_j}/pan_blocks_\1")
    rules += [
        (rf"{pd_t}\.mask_features\.weight", f"params/{pd_j}/mask_features/kernel", _conv),
        (rf"{pd_t}\.mask_features\.bias", f"params/{pd_j}/mask_features/bias", _id),
    ]

    pr_t, pr_j = r"head\.predictor", "predictor"
    rules += [
        (rf"{pr_t}\.input_proj\.(\d+)\.conv\.weight", rf"params/{pr_j}/input_proj_\1_conv/kernel", _conv),
        *_bn_rules(rf"{pr_t}\.input_proj\.(\d+)\.norm", rf"{pr_j}/input_proj_\1_bn"),
    ]
    dl_t = rf"{pr_t}\.decoder\.layers\.(\d+)"
    dl_j = rf"{pr_j}/decoder_layers_\1"
    rules += mha_rules(rf"{dl_t}\.self_attn", rf"params/{dl_j}/self_attn")
    for sub in ("sampling_offsets", "attention_weights", "value_proj", "output_proj"):
        rules += dense_rules(rf"{dl_t}\.cross_attn\.{sub}", rf"{dl_j}/cross_attn/{sub}")
    rules += dense_rules(rf"{dl_t}\.linear1", rf"{dl_j}/linear1")
    rules += dense_rules(rf"{dl_t}\.linear2", rf"{dl_j}/linear2")
    for n in ("norm1", "norm2", "norm3"):
        rules += ln_rules(rf"{dl_t}\.{n}", rf"{dl_j}/{n}")

    rules += dense_rules(rf"{pr_t}\.query_pos_head\.layers\.(\d+)", rf"{pr_j}/query_pos_head/layers_\1")
    rules += dense_rules(rf"{pr_t}\.enc_output\.0", f"{pr_j}/enc_output_0")
    rules += ln_rules(rf"{pr_t}\.enc_output\.1", f"{pr_j}/enc_output_1")
    rules += dense_rules(rf"{pr_t}\.enc_score_classifier", f"{pr_j}/enc_score_classifier")
    rules += dense_rules(rf"{pr_t}\.enc_bbox_classifier\.layers\.(\d+)", rf"{pr_j}/enc_bbox_classifier/layers_\1")
    rules += dense_rules(rf"{pr_t}\.dec_score_classifier\.(\d+)", rf"{pr_j}/dec_score_classifier_\1")
    rules += dense_rules(
        rf"{pr_t}\.dec_bbox_classifier\.(\d+)\.layers\.(\d+)", rf"{pr_j}/dec_bbox_classifier_\1/layers_\2"
    )
    return rules


def masked_decoder_rules() -> List[Rule]:
    """Shared masked-attention query-decoder rules (fai_mf + bisenetformer)."""
    rules: List[Rule] = []
    pr_t, pr_j = r"head\.predictor", "predictor"
    rules += [
        (rf"{pr_t}\.query_feat\.weight", f"params/{pr_j}/query_feat", _id),
        (rf"{pr_t}\.query_embed\.weight", f"params/{pr_j}/query_embed", _id),
        (rf"{pr_t}\.input_proj\.(\d+)\.weight", rf"params/{pr_j}/input_proj_\1/kernel", _conv),
        (rf"{pr_t}\.input_proj\.(\d+)\.bias", rf"params/{pr_j}/input_proj_\1/bias", _id),
    ]
    rules += mha_rules(
        rf"{pr_t}\.transformer_cross_attention_layers\.(\d+)\.multihead_attn",
        rf"params/{pr_j}/transformer_cross_attention_layers_\1/multihead_attn",
    )
    rules += ln_rules(
        rf"{pr_t}\.transformer_cross_attention_layers\.(\d+)\.norm",
        rf"{pr_j}/transformer_cross_attention_layers_\1/norm",
    )
    rules += mha_rules(
        rf"{pr_t}\.transformer_self_attention_layers\.(\d+)\.self_attn",
        rf"params/{pr_j}/transformer_self_attention_layers_\1/self_attn",
    )
    rules += ln_rules(
        rf"{pr_t}\.transformer_self_attention_layers\.(\d+)\.norm",
        rf"{pr_j}/transformer_self_attention_layers_\1/norm",
    )
    rules += dense_rules(
        rf"{pr_t}\.transformer_ffn_layers\.(\d+)\.linear1", rf"{pr_j}/transformer_ffn_layers_\1/linear1"
    )
    rules += dense_rules(
        rf"{pr_t}\.transformer_ffn_layers\.(\d+)\.linear2", rf"{pr_j}/transformer_ffn_layers_\1/linear2"
    )
    rules += ln_rules(rf"{pr_t}\.transformer_ffn_layers\.(\d+)\.norm", rf"{pr_j}/transformer_ffn_layers_\1/norm")
    fh = rf"{pr_t}\.forward_prediction_heads"
    fhj = f"{pr_j}/forward_prediction_heads"
    rules += ln_rules(rf"{fh}\.decoder_norm", f"{fhj}/decoder_norm")
    rules += dense_rules(rf"{fh}\.classifier", f"{fhj}/classifier")
    rules += dense_rules(rf"{fh}\.mask_classifier\.layers\.(\d+)", rf"{fhj}/mask_classifier/layers_\1")
    return rules


def fai_mf_rules() -> List[Rule]:
    rules: List[Rule] = []
    rules += backbone_rules(r"pixel_decoder\.backbone", "backbone")

    pd = "pixel_decoder"
    rules += [
        (rf"{pd}\.input_proj\.weight", f"params/{pd}/input_proj/kernel", _conv),
        (rf"{pd}\.input_proj\.bias", f"params/{pd}/input_proj/bias", _id),
    ]
    rules += transformer_encoder_layer_rules(
        rf"{pd}\.transformer\.encoder\.layers\.(\d+)", rf"{pd}/transformer_layers_\1"
    )
    rules += ln_rules(rf"{pd}\.transformer\.encoder\.norm", f"{pd}/transformer_norm")
    rules += [
        (rf"{pd}\.adapter_(\d)\.weight", rf"params/{pd}/adapter_\1_conv/kernel", _conv),
        *_bn_rules(rf"{pd}\.adapter_(\d)\.norm", rf"{pd}/adapter_\1_norm"),
        (rf"{pd}\.layer_(\d)\.weight", rf"params/{pd}/layer_\1_conv/kernel", _conv),
        *_bn_rules(rf"{pd}\.layer_(\d)\.norm", rf"{pd}/layer_\1_norm"),
        (rf"{pd}\.mask_features\.weight", f"params/{pd}/mask_features/kernel", _conv),
        (rf"{pd}\.mask_features\.bias", f"params/{pd}/mask_features/bias", _id),
    ]

    rules += masked_decoder_rules()
    return rules


def fai_cls_rules() -> List[Rule]:
    rules = backbone_rules(r"backbone", "backbone")
    # head: Sequential indices → fc1/fc2 (1-layer head conv at idx 2;
    # 2-layer head convs at idx 1 and 4)
    rules += [
        (r"cls_head\.classifier\.2\.weight", "params/cls_head/fc1/kernel", _conv),
        (r"cls_head\.classifier\.2\.bias", "params/cls_head/fc1/bias", _id),
        (r"cls_head\.classifier\.1\.weight", "params/cls_head/fc1/kernel", _conv),
        (r"cls_head\.classifier\.1\.bias", "params/cls_head/fc1/bias", _id),
        (r"cls_head\.classifier\.4\.weight", "params/cls_head/fc2/kernel", _conv),
        (r"cls_head\.classifier\.4\.bias", "params/cls_head/fc2/bias", _id),
    ]
    return rules


FAMILY_RULES: Dict[str, Callable[[], List[Rule]]] = {
    "fai_detr": fai_detr_rules,
    "fai_cls": fai_cls_rules,
    "fai_mf": fai_mf_rules,
}


def convert_state_dict(
    state: Dict[str, np.ndarray], family: str, verbose: bool = True
) -> Tuple[Dict[str, Any], List[str]]:
    """→ (variables {params, batch_stats}, unmatched torch keys)."""
    rules = FAMILY_RULES[family]()
    flat, unmatched = apply_rules(state, rules)
    flat = expand_mha(flat)
    if verbose and unmatched:
        from focoos_tpu.utils.logger import get_logger

        get_logger(__name__).warning(f"{len(unmatched)} torch keys unmatched, e.g. {unmatched[:5]}")
    return unflatten_tree(flat), unmatched


def _convbnrelu_rules(tp: str, jp: str) -> List[Rule]:
    return [
        (rf"{tp}\.conv\.weight", f"params/{jp}/conv/kernel", _conv),
        *_bn_rules(rf"{tp}\.bn", f"{jp}/bn"),
    ]


def bisenetformer_rules() -> List[Rule]:
    rules = backbone_rules(r"pixel_decoder\.backbone", "backbone")
    pd = "pixel_decoder"
    for t_arm, j_arm in (("arm32", "cp_arm32"), ("arm16", "cp_arm16"), ("arm8", "cp_arm8")):
        rules += [
            (rf"{pd}\.cp\.{t_arm}\.proj\.weight", f"params/{pd}/{j_arm}/proj/kernel", _conv),
            (rf"{pd}\.cp\.{t_arm}\.conv_atten\.weight", f"params/{pd}/{j_arm}/conv_atten/kernel", _conv),
            *_bn_rules(rf"{pd}\.cp\.{t_arm}\.bn_atten", f"{pd}/{j_arm}/bn_atten"),
            *_convbnrelu_rules(rf"{pd}\.cp\.{t_arm}\.conv", f"{pd}/{j_arm}/conv"),
        ]
    for t_c, j_c in (
        ("conv_avg", "cp_conv_avg"),
        ("conv_head32", "cp_conv_head32"),
        ("conv_head16", "cp_conv_head16"),
        ("conv_head8", "cp_conv_head8"),
    ):
        rules += _convbnrelu_rules(rf"{pd}\.cp\.{t_c}", f"{pd}/{j_c}")
    rules += [
        (rf"{pd}\.ffm\.proj1\.weight", f"params/{pd}/ffm/proj1/kernel", _conv),
        (rf"{pd}\.ffm\.proj1\.bias", f"params/{pd}/ffm/proj1/bias", _id),
        (rf"{pd}\.ffm\.proj2\.weight", f"params/{pd}/ffm/proj2/kernel", _conv),
        (rf"{pd}\.ffm\.proj2\.bias", f"params/{pd}/ffm/proj2/bias", _id),
        (rf"{pd}\.ffm\.conv1\.weight", f"params/{pd}/ffm/conv1/kernel", _conv),
        (rf"{pd}\.ffm\.conv2\.weight", f"params/{pd}/ffm/conv2/kernel", _conv),
        *_convbnrelu_rules(rf"{pd}\.ffm\.convblk", f"{pd}/ffm/convblk"),
    ]
    rules += _convbnrelu_rules(rf"{pd}\.conv_out", f"{pd}/conv_out")
    rules += masked_decoder_rules()
    return rules


FAMILY_RULES["bisenetformer"] = bisenetformer_rules


def _cm_rules(tp: str, jp: str) -> List[Rule]:
    """csp_darknet ConvModule: conv + bn."""
    return [
        (rf"{tp}\.conv\.weight", f"params/{jp}/conv/kernel", _conv),
        *_bn_rules(rf"{tp}\.bn", f"{jp}/bn"),
    ]


def csp_darknet_rules(tp: str, jp: str) -> List[Rule]:
    rules: List[Rule] = []
    rules += _cm_rules(rf"{tp}\.stem\.conv", f"{jp}/stem/conv")

    def csp_layer(t, j):
        r = []
        for c in ("main_conv", "short_conv", "final_conv"):
            r += _cm_rules(rf"{t}\.{c}", rf"{j}/{c}")
        g = re.compile(t).groups + 1
        r += _cm_rules(rf"{t}\.blocks\.(\d+)\.conv1", rf"{j}/blocks_\{g}/conv1")
        r += _cm_rules(rf"{t}\.blocks\.(\d+)\.conv2", rf"{j}/blocks_\{g}/conv2")
        r += [
            (rf"{t}\.attention\.fc\.weight", rf"params/{j}/attention/fc/kernel", _conv),
            (rf"{t}\.attention\.fc\.bias", rf"params/{j}/attention/fc/bias", _id),
        ]
        return r

    for i in range(1, 5):
        # stage: Sequential(conv[, spp], csp) — spp only in stage4
        rules += _cm_rules(rf"{tp}\.stage{i}\.0", rf"{jp}/stage{i}_conv")
        if i == 4:
            rules += _cm_rules(rf"{tp}\.stage{i}\.1\.conv1", rf"{jp}/stage{i}_spp/conv1")
            rules += _cm_rules(rf"{tp}\.stage{i}\.1\.conv2", rf"{jp}/stage{i}_spp/conv2")
            rules += csp_layer(rf"{tp}\.stage{i}\.2", rf"{jp}/stage{i}_csp")
        else:
            rules += csp_layer(rf"{tp}\.stage{i}\.1", rf"{jp}/stage{i}_csp")
    return rules


def rtmo_rules() -> List[Rule]:
    rules = csp_darknet_rules(r"backbone", "backbone")

    nk = "neck"
    rules += [
        (rf"{nk}\.input_proj\.(\d+)\.conv\.weight", rf"params/{nk}/input_proj_\1/conv/kernel", _conv),
        *_bn_rules(rf"{nk}\.input_proj\.(\d+)\.bn", rf"{nk}/input_proj_\1/bn"),
    ]
    el = rf"{nk}\.encoder\.0\.layers\.(\d+)"
    elj = rf"{nk}/encoder_0_layers_\1"
    rules += mha_rules(rf"{el}\.self_attn\.attn", rf"params/{elj}/self_attn")
    rules += dense_rules(rf"{el}\.ffn\.layers\.0\.0", rf"{elj}/ffn_linear1")
    rules += dense_rules(rf"{el}\.ffn\.layers\.1", rf"{elj}/ffn_linear2")
    rules += ln_rules(rf"{el}\.norms\.0", rf"{elj}/norm1")
    rules += ln_rules(rf"{el}\.norms\.1", rf"{elj}/norm2")

    def neck_csp(t, j):
        r = []
        for c in ("conv1", "conv2", "conv3"):
            r += _cm_rules(rf"{t}\.{c}", rf"{j}/{c}")
        g = re.compile(t).groups + 1
        for br in ("branch_3x3", "branch_1x1"):
            r += [
                (rf"{t}\.bottlenecks\.(\d+)\.{br}\.conv\.weight", rf"params/{j}/bottlenecks_\{g}/{br}/conv/kernel", _conv),
                *_bn_rules(rf"{t}\.bottlenecks\.(\d+)\.{br}\.bn", rf"{j}/bottlenecks_\{g}/{br}/bn"),
            ]
        return r

    rules += _cm_rules(rf"{nk}\.lateral_convs\.(\d+)", rf"{nk}/lateral_convs_\1")
    rules += neck_csp(rf"{nk}\.fpn_blocks\.(\d+)", rf"{nk}/fpn_blocks_\1")
    rules += _cm_rules(rf"{nk}\.downsample_convs\.(\d+)", rf"{nk}/downsample_convs_\1")
    rules += neck_csp(rf"{nk}\.pan_blocks\.(\d+)", rf"{nk}/pan_blocks_\1")
    rules += [
        (rf"{nk}\.projector\.convs\.(\d+)\.conv\.weight", rf"params/{nk}/projector_\1_conv/kernel", _conv),
        *_bn_rules(rf"{nk}\.projector\.convs\.(\d+)\.bn", rf"{nk}/projector_\1_bn"),
    ]

    hm = r"head\.head_module"
    hmj = "head_module"
    for branch, jb in (("conv_cls", "conv_cls"), ("conv_pose", "conv_pose")):
        rules += [
            (rf"{hm}\.{branch}\.(\d+)\.(\d+)\.conv\.weight", rf"params/{hmj}/{jb}_\1_\2_conv/kernel", _conv),
            *_bn_rules(rf"{hm}\.{branch}\.(\d+)\.(\d+)\.bn", rf"{hmj}/{jb}_\1_\2_bn"),
        ]
    for out in ("out_cls", "out_bbox", "out_kpt_reg", "out_kpt_vis", "out_pose"):
        rules += [
            (rf"{hm}\.{out}\.(\d+)\.weight", rf"params/{hmj}/{out}_\1/kernel", _conv),
            (rf"{hm}\.{out}\.(\d+)\.bias", rf"params/{hmj}/{out}_\1/bias", _id),
        ]

    dcc = r"head\.dcc"
    dj = "dcc"
    rules += dense_rules(rf"{dcc}\.x_fc", f"{dj}/x_fc")
    rules += dense_rules(rf"{dcc}\.y_fc", f"{dj}/y_fc")
    rules += dense_rules(rf"{dcc}\.pose_to_kpts\.0", f"{dj}/pose_to_kpts_fc")
    rules += _bn_rules(rf"{dcc}\.pose_to_kpts\.1", f"{dj}/pose_to_kpts_bn")
    rules += [
        (rf"{dcc}\.pos_enc", f"params/{dj}/pos_enc", _id),
        (rf"{dcc}\.gau\.uv\.weight", f"params/{dj}/gau/uv/kernel", _linear),
        (rf"{dcc}\.gau\.o\.weight", f"params/{dj}/gau/o/kernel", _linear),
        (rf"{dcc}\.gau\.gamma", f"params/{dj}/gau/gamma", _id),
        (rf"{dcc}\.gau\.beta", f"params/{dj}/gau/beta", _id),
        (rf"{dcc}\.gau\.ln\.g", f"params/{dj}/gau/ln_g", _id),
        (rf"{dcc}\.gau\.res_scale\.scale", f"params/{dj}/gau/res_scale", _id),
        # training-only sigma head: carried for completeness
        *dense_rules(rf"{dcc}\.sigma_fc\.0", f"{dj}/sigma_fc"),
        (rf"{dcc}\.sigma_fc\.2\.scale", f"params/{dj}/sigma_scale", _id),
    ]
    return rules


FAMILY_RULES["rtmo"] = rtmo_rules


def convnextv2_rules(tp: str, jp: str) -> List[Rule]:
    """ConvNeXtV2 (reference layout: downsample_layers.{i}.{0,1}, stages.{i}.{j})."""
    rules: List[Rule] = [
        (rf"{tp}\.downsample_layers\.0\.0\.weight", f"params/{jp}/downsample_0_conv/kernel", _conv),
        (rf"{tp}\.downsample_layers\.0\.0\.bias", f"params/{jp}/downsample_0_conv/bias", _id),
        *ln_rules(rf"{tp}\.downsample_layers\.0\.1", f"{jp}/downsample_0_norm"),
    ]
    for i in (1, 2, 3):
        rules += [
            *ln_rules(rf"{tp}\.downsample_layers\.{i}\.0", f"{jp}/downsample_{i}_norm"),
            (rf"{tp}\.downsample_layers\.{i}\.1\.weight", f"params/{jp}/downsample_{i}_conv/kernel", _conv),
            (rf"{tp}\.downsample_layers\.{i}\.1\.bias", f"params/{jp}/downsample_{i}_conv/bias", _id),
        ]
    blk_t = rf"{tp}\.stages\.(\d+)\.(\d+)"
    blk_j = rf"{jp}/stages_\1_\2"
    rules += [
        (rf"{blk_t}\.dwconv\.weight", rf"params/{blk_j}/dwconv/kernel", _conv),
        (rf"{blk_t}\.dwconv\.bias", rf"params/{blk_j}/dwconv/bias", _id),
        *ln_rules(rf"{blk_t}\.norm", rf"{blk_j}/norm"),
        *dense_rules(rf"{blk_t}\.pwconv1", rf"{blk_j}/pwconv1"),
        *dense_rules(rf"{blk_t}\.pwconv2", rf"{blk_j}/pwconv2"),
        (rf"{blk_t}\.grn\.gamma", rf"params/{blk_j}/grn/gamma", lambda w: w.reshape(-1)),
        (rf"{blk_t}\.grn\.beta", rf"params/{blk_j}/grn/beta", lambda w: w.reshape(-1)),
    ]
    return rules


def mobilenet_v2_rules(tp: str, jp: str) -> List[Rule]:
    """MobileNetV2 (reference layout: conv1, layer{i}.{j}.conv.{k})."""

    def conv2d_norm(t, j):
        return [
            (rf"{t}\.weight", f"params/{j}_conv/kernel", _conv),
            *_bn_rules(rf"{t}\.norm", f"{j}_bn"),
        ]

    rules = conv2d_norm(rf"{tp}\.conv1", f"{jp}/conv1")
    # layer1 has expand_ratio==1 → only (dw, project); must match before the
    # generic 3-conv pattern
    l1_t = rf"{tp}\.layer1\.(\d+)\.conv"
    l1_j = rf"{jp}/layer1_\1"
    rules += conv2d_norm(rf"{l1_t}\.0", rf"{l1_j}/dw")
    rules += [
        (rf"{l1_t}\.1\.weight", rf"params/{l1_j}/project_conv/kernel", _conv),
        *_bn_rules(rf"{l1_t}\.1\.norm", rf"{l1_j}/project_bn"),
    ]
    base_t = rf"{tp}\.layer(\d+)\.(\d+)\.conv"
    base_j = rf"{jp}/layer\1_\2"
    rules += conv2d_norm(rf"{base_t}\.0", rf"{base_j}/expand")
    rules += conv2d_norm(rf"{base_t}\.1", rf"{base_j}/dw")
    rules += [
        (rf"{base_t}\.2\.weight", rf"params/{base_j}/project_conv/kernel", _conv),
        *_bn_rules(rf"{base_t}\.2\.norm", rf"{base_j}/project_bn"),
    ]
    return rules


def swin_rules(tp: str, jp: str) -> List[Rule]:
    rules: List[Rule] = [
        (rf"{tp}\.patch_embed\.proj\.weight", f"params/{jp}/patch_embed_proj/kernel", _conv),
        (rf"{tp}\.patch_embed\.proj\.bias", f"params/{jp}/patch_embed_proj/bias", _id),
        *ln_rules(rf"{tp}\.patch_embed\.norm", f"{jp}/patch_embed_norm"),
    ]
    blk_t = rf"{tp}\.layers\.(\d+)\.blocks\.(\d+)"
    blk_j = rf"{jp}/layers_\1_blocks_\2"
    rules += [
        *ln_rules(rf"{blk_t}\.norm1", rf"{blk_j}/norm1"),
        *ln_rules(rf"{blk_t}\.norm2", rf"{blk_j}/norm2"),
        *dense_rules(rf"{blk_t}\.attn\.qkv", rf"{blk_j}/attn/qkv"),
        *dense_rules(rf"{blk_t}\.attn\.proj", rf"{blk_j}/attn/proj"),
        (rf"{blk_t}\.attn\.relative_position_bias_table",
         rf"params/{blk_j}/attn/relative_position_bias_table", _id),
        *dense_rules(rf"{blk_t}\.mlp\.fc1", rf"{blk_j}/mlp_fc1"),
        *dense_rules(rf"{blk_t}\.mlp\.fc2", rf"{blk_j}/mlp_fc2"),
    ]
    rules += [
        *ln_rules(rf"{tp}\.layers\.(\d+)\.downsample\.norm", rf"{jp}/layers_\1_downsample_norm"),
        (rf"{tp}\.layers\.(\d+)\.downsample\.reduction\.weight",
         rf"params/{jp}/layers_\1_downsample_reduction/kernel", _linear),
        *ln_rules(rf"{tp}\.norm(\d)", rf"{jp}/norm\1"),
    ]
    return rules
