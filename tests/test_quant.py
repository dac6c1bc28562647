"""int8 post-training quantization (quant.py).

Three layers of assurance:
1. exact-arithmetic parity — with inputs/weights constructed on a
   power-of-two grid whose max-abs entries pin the dynamic scales, the
   int8 im2col GEMM must reproduce the float conv EXACTLY (catches any
   layout / padding / dilation mistake, not just gross ones);
2. interception plumbing — only layers clearing the QuantConfig floors
   are swapped, everything else bit-matches the float path;
3. whole-model fidelity — ECAPA embeddings from the int8 path stay
   cosine-aligned with the fp32 path, and trial-pair scores track.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speakerverification_tpu.quant import (
    QuantConfig,
    calibrate_act_scales,
    int8_apply,
    make_int8_embed_fn,
)

ALL = QuantConfig(min_k=1, min_n=1)


def _grid_array(rng, shape, scale, per_channel_axis=None):
    """Integers in [-127, 127] times ``scale``, with a guaranteed ±127
    entry (per channel when asked) so the dynamic max-abs scale lands
    exactly on ``scale`` and quantization is lossless."""
    v = rng.integers(-31, 32, size=shape).astype(np.float32)
    if per_channel_axis is None:
        flat = v.reshape(-1)
        flat[0] = 127.0
    else:
        v = np.moveaxis(v, per_channel_axis, -1)
        v[(0,) * (v.ndim - 1) + (slice(None),)] = 127.0
        v = np.moveaxis(v, -1, per_channel_axis)
    return jnp.asarray(v * scale)


class _OneConv(nn.Module):
    features: int
    kernel_size: int
    dilation: int = 1
    padding: str = "VALID"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (self.kernel_size,),
                       kernel_dilation=(self.dilation,),
                       padding=self.padding, use_bias=self.use_bias)(x)


@pytest.mark.parametrize("k,dilation,padding", [
    (1, 1, "VALID"),
    (3, 1, "SAME"),
    (3, 2, "SAME"),
    (3, 4, "VALID"),
    (5, 1, "SAME"),
    (5, 3, "SAME"),
    (4, 2, "SAME"),      # even kernel: asymmetric SAME pad split
])
def test_int8_conv_exact_arithmetic(k, dilation, padding):
    rng = np.random.default_rng(k * 10 + dilation)
    cin, cout, t = 12, 7, 40
    x = _grid_array(rng, (2, t, cin), 2.0 ** -5)
    mod = _OneConv(cout, k, dilation, padding)
    var = mod.init(jax.random.PRNGKey(0), x)
    kernel = _grid_array(rng, (k, cin, cout), 2.0 ** -6, per_channel_axis=2)
    bias = _grid_array(rng, (cout,), 2.0 ** -4)
    var = {"params": {"Conv_0": {"kernel": kernel, "bias": bias}}}

    ref = mod.apply(var, x)
    got = int8_apply(mod, var, x, config=ALL)
    assert got.shape == ref.shape
    # every intermediate is exactly representable -> exact equality
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_int8_dense_exact_arithmetic():
    rng = np.random.default_rng(0)
    x = _grid_array(rng, (3, 5, 16), 2.0 ** -5)
    kernel = _grid_array(rng, (16, 9), 2.0 ** -6, per_channel_axis=1)
    bias = _grid_array(rng, (9,), 2.0 ** -4)
    mod = nn.Dense(9)
    var = {"params": {"kernel": kernel, "bias": bias}}
    ref = mod.apply(var, x)
    got = int8_apply(mod, var, x, config=ALL)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_quant_config_floors_leave_small_layers_exact():
    """Layers below min_k/min_n must bit-match the float path."""
    class Two(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3,), padding="SAME")(x)     # k*cin=12 < min_k
            return nn.Dense(4)(x)                        # k=8 < min_k

    m = Two()
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 10, 4)),
                    jnp.float32)
    var = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(var, x)
    got = int8_apply(m, var, x, config=QuantConfig(min_k=64, min_n=2))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_strided_and_grouped_convs_fall_back():
    """Strides/groups are out of scope: must route to the float conv."""
    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            a = nn.Conv(8, (3,), strides=(2,), padding="SAME")(x)
            b = nn.Conv(8, (3,), feature_group_count=4, padding="SAME")(x)
            return a.sum() + b.sum()

    m = M()
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 12, 8)),
                    jnp.float32)
    var = m.init(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(
        np.asarray(int8_apply(m, var, x, config=ALL)),
        np.asarray(m.apply(var, x)))


def test_pallas_quant_matmul_matches_xla_int8_path():
    """ops/pallas_quant.py (interpret mode) must reproduce the XLA
    static-scale int8 GEMM bit-for-bit at fp32 tolerance — same
    quantization decisions, fused epilogue."""
    from speakerverification_tpu.ops.pallas_quant import quant_matmul

    rng = np.random.default_rng(7)
    M, K, N = 70, 96, 50
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
    act = float(np.max(np.abs(np.asarray(x))))
    got = np.asarray(quant_matmul(x, w, b, act, block_m=64, interpret=True))

    s_x = act / 127.0
    s_w = np.max(np.abs(np.asarray(w)), axis=0) / 127.0
    xq = np.clip(np.round(np.asarray(x) / s_x), -127, 127).astype(np.int32)
    wq = np.clip(np.round(np.asarray(w) / s_w[None, :]),
                 -127, 127).astype(np.int32)
    ref = (xq @ wq).astype(np.float32) * (s_x * s_w)[None, :] \
        + np.asarray(b)[None, :]
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-4)


def test_static_scales_match_dynamic_within_a_quantum():
    """Calibrated on the very batch it serves, static-scale quantization
    must agree with dynamic mode to within one quantization step per
    layer (the scales are identical up to f64-vs-f32 scale arithmetic)."""
    class Two(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(64, (3,), padding="SAME")(x)
            return nn.Dense(32)(x)

    m = Two()
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 20, 16)),
                    jnp.float32)
    var = m.init(jax.random.PRNGKey(0), x)
    scales = calibrate_act_scales(m, var, x, config=ALL)
    assert set(scales) == {"Conv_0", "Dense_0"} and min(scales.values()) > 0

    dyn = np.asarray(int8_apply(m, var, x, config=ALL))
    sta = np.asarray(int8_apply(m, var, x, config=ALL, act_scales=scales))
    # one output quantum ~= s_x*s_w summed over the couple of flipped
    # rounding decisions; the layers here keep it well under 0.1
    assert np.max(np.abs(dyn - sta)) < 0.1
    # and both track the float model
    ref = np.asarray(m.apply(var, x))
    assert np.max(np.abs(sta - ref)) < 0.35, np.max(np.abs(sta - ref))


def _small_ecapa():
    from speakerverification_tpu.encoder import SpeakerEncoder
    from speakerverification_tpu.models.ecapa_tdnn import ECAPA_TDNN
    backbone = ECAPA_TDNN(lin_neurons=64,
                          channels=(256, 256, 256, 256, 768),
                          feature_type="melspectrogram")
    return SpeakerEncoder(backbone=backbone, feature_type="melspectrogram",
                          frontend_backend="xla")


@pytest.mark.slow        # three int8 program compiles ≈ 37 s cold; int8
                         # stays default-covered by the CLI e2e
                         # (test_cli_infer_eval_int8_quant)
def test_int8_ecapa_embeddings_cosine_aligned():
    model = _small_ecapa()
    rng = np.random.default_rng(3)
    wave = jnp.asarray(rng.normal(0, 0.1, (4, 8000)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), wave[:2])
    params, stats = variables["params"], variables.get("batch_stats", {})

    from speakerverification_tpu.training.train_step import make_eval_embed_fn
    ref = np.asarray(make_eval_embed_fn(model)(params, stats, wave))
    # aggressive floors: every k=1 conv, the Res2 cascade, MFA and fc all
    # go int8 — stronger fidelity claim than the serving defaults
    aggressive = QuantConfig(min_k=64, min_n=32)
    got = np.asarray(make_int8_embed_fn(
        model, config=aggressive)(params, stats, wave))

    # static-scale serving mode: calibrate on half the batch, embed all
    scales = calibrate_act_scales(
        model, {"params": params, "batch_stats": stats}, wave[:2],
        config=aggressive)
    sta = np.asarray(make_int8_embed_fn(
        model, config=aggressive, act_scales=scales)(params, stats, wave))
    cos_sta = np.sum(sta * ref, axis=-1)
    assert cos_sta.min() > 0.995, cos_sta

    assert got.shape == ref.shape
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)
    cos = np.sum(got * ref, axis=-1)          # both L2-normalized
    assert cos.min() > 0.995, cos

    # trial-pair scores must track: cosine score matrix of the int8
    # embeddings stays within a few 1e-3 of the fp32 one
    assert np.max(np.abs(got @ got.T - ref @ ref.T)) < 2e-2


def _remat_int8_hparams(tmp_path):
    return {
        "save_folder": str(tmp_path), "nClasses": 4,
        "audio_spec": {"sample_rate": 8000, "sentence_len": 1.0,
                       "win_len": 0.025, "hop_len": 0.01},
        "n_mels": 24, "features": "melspectrogram",
        "model": {"name": "ECAPA_TDNN", "feature_type": "melspectrogram",
                  "nOut": 16, "remat": True,
                  "channels": [16, 16, 16, 16, 48],
                  "kernel_sizes": [5, 3, 3, 3, 1],
                  "dilations": [1, 2, 3, 4, 1], "attention_channels": 4,
                  "res2net_scale": 4, "se_channels": 4},
        "criterion": {"name": "AAmSoftmax"},
        "quant": "int8",
    }


def test_inference_engine_strips_remat(tmp_path):
    """model.remat is a training-memory knob: the engine must build the
    eval model without it (int8 calibration's eager activation probes
    cannot run inside a jax.checkpoint region)."""
    from speakerverification_tpu.inference import InferenceEngine

    eng = InferenceEngine(_remat_int8_hparams(tmp_path))
    assert eng.model.backbone.remat is False


@pytest.mark.slow        # int8-interception compile ≈ 10 s cold; the
                         # strip itself is asserted by the fast test above
def test_int8_extraction_on_remat_configured_model(tmp_path):
    """int8 extraction (calibration probes + quantized embed) must work
    end-to-end on a remat-configured model after the engine's strip."""
    from speakerverification_tpu.inference import InferenceEngine

    eng = InferenceEngine(_remat_int8_hparams(tmp_path))
    rng = np.random.default_rng(3)
    emb = np.asarray(eng.embed_fn(
        rng.normal(0, .1, (4, 8000)).astype(np.float32)))
    assert emb.shape == (4, 16) and np.isfinite(emb).all()
