"""Model topology tests: shapes, downsampling, attention branch, dtype."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdd_tpu.models.ctc_model import CTCAttentionModel, ModelConfig


@pytest.fixture(scope="module")
def small_cfg():
    return ModelConfig(input_dim=243, num_class=43, rnn_hidden_size=64,
                       rnn_layers=2, text_embed_size=32, text_vocab_size=45,
                       dropout=0.1)


def _init_and_run(cfg, b=2, t=16, l=7, train=False):
    model = CTCAttentionModel(cfg)
    feats = jnp.zeros((b, t, cfg.input_dim))
    trans = jnp.zeros((b, l), jnp.int32)
    lengths = jnp.asarray([l] * b)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        feats, trans, lengths, train=False)
    out, mutated = model.apply(
        variables, feats, trans, lengths, train=train,
        rngs={"dropout": jax.random.key(2)} if train else None,
        mutable=["batch_stats"] if train else [])
    return model, variables, out


def test_output_shape_and_layout(small_cfg):
    cfg = small_cfg
    _, _, out = _init_and_run(cfg, b=2, t=16, l=7)
    # conv time downsample 2: (T', B, C) reference layout
    assert out.shape == (cfg.output_frames(16), 2, cfg.num_class)
    assert out.shape[0] == 8
    # log-softmax: rows sum to 1 in prob space
    np.testing.assert_allclose(
        np.exp(np.asarray(out)).sum(-1), 1.0, rtol=1e-4)


def test_conv_output_dim_formula(small_cfg):
    # 243 -> (243+2-3)//2+1=122 -> (122+2-3)//2+1=61; 61*32=1952
    assert small_cfg.conv_output_dim() == 1952
    assert small_cfg.time_downsample == 2


def test_baseline_variant_no_text_branch():
    cfg = ModelConfig(input_dim=243, num_class=41, rnn_hidden_size=64,
                      rnn_layers=2, use_text_attention=False)
    model = CTCAttentionModel(cfg)
    feats = jnp.zeros((2, 8, 243))
    trans = jnp.zeros((2, 5), jnp.int32)
    variables = model.init(jax.random.key(0), feats, trans, train=False)
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    names = ["/".join(str(k) for k in path) for path, _ in flat]
    assert not any("text" in n for n in names)
    out = model.apply(variables, feats, trans, train=False)
    assert out.shape == (4, 2, 41)


def test_full_size_param_count():
    # Flagship config: same hyper-parameters as the reference best model
    # (conf/ctc_config.yaml: hidden 384, 4 layers, conv (1,2)/(2,2)).
    cfg = ModelConfig()
    model = CTCAttentionModel(cfg)
    feats = jnp.zeros((1, 8, 243))
    trans = jnp.zeros((1, 4), jnp.int32)
    variables = model.init(jax.random.key(0), feats, trans, train=False)
    n = sum(p.size for p in jax.tree.leaves(variables["params"]))
    # Same order of magnitude as the reference's 16.5M; ours counts the
    # exact same GEMM stack (the reference's train.log model was a
    # MultiHeadedAttention-era variant, so equality is not expected).
    assert 15_000_000 < n < 30_000_000


def test_train_mode_runs_with_dropout_and_bn(small_cfg):
    _, _, out = _init_and_run(small_cfg, train=True)
    assert np.all(np.isfinite(np.asarray(out)))


def test_attention_mask_blocks_padding(small_cfg):
    cfg = small_cfg
    model = CTCAttentionModel(cfg)
    feats = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 243)),
                        jnp.float32)
    trans_a = jnp.asarray([[2, 3, 4, 0, 0]])
    trans_b = jnp.asarray([[2, 3, 4, 9, 9]])  # different *padding* content
    lengths = jnp.asarray([3])
    variables = model.init(jax.random.key(0), feats, trans_a, lengths, train=False)
    out_a = model.apply(variables, feats, trans_a, lengths, train=False)
    out_b = model.apply(variables, feats, trans_b, lengths, train=False)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-4, atol=1e-5)


def test_bfloat16_compute_path():
    cfg = ModelConfig(input_dim=243, num_class=43, rnn_hidden_size=64,
                      rnn_layers=2, compute_dtype="bfloat16")
    model = CTCAttentionModel(cfg)
    feats = jnp.zeros((2, 8, 243))
    trans = jnp.zeros((2, 5), jnp.int32)
    variables = model.init(jax.random.key(0), feats, trans, train=False)
    out = model.apply(variables, feats, trans, train=False)
    assert out.dtype == jnp.float32  # head casts back for the CTC loss
    assert np.all(np.isfinite(np.asarray(out)))
