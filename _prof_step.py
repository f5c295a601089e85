"""Profile the training step breakdown on TPU (honest timing via value fetch)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from mdd_tpu.data.dataset import Batch
from mdd_tpu.models.ctc_model import ModelConfig, CTCAttentionModel
from mdd_tpu.train.loop import Trainer
from mdd_tpu.ops.ctc_loss import ctc_loss

BATCH, FRAMES, LABEL_LEN = 512, 160, 48

cfg = ModelConfig(compute_dtype="bfloat16",
                  use_pallas_lstm=jax.default_backend() == "tpu")
trainer = Trainer(cfg, sample_t=FRAMES, sample_l=LABEL_LEN)

rng = np.random.default_rng(0)
batch = Batch(
    inputs=rng.standard_normal((BATCH, FRAMES, cfg.input_dim)).astype(np.float32),
    input_fracs=np.full((BATCH,), 1.0, np.float32),
    targets=rng.integers(2, cfg.num_class, (BATCH, LABEL_LEN)).astype(np.int32),
    target_sizes=np.full((BATCH,), LABEL_LEN, np.int32),
    trans=rng.integers(2, cfg.num_class, (BATCH, LABEL_LEN)).astype(np.int32),
    trans_sizes=np.full((BATCH,), LABEL_LEN, np.int32),
    utt_ids=[f"u{i}" for i in range(BATCH)],
)
arrays = trainer._batch_arrays(batch)
state = trainer.state
model = trainer.model


def timeit(name, fn, n=10):
    r = fn()  # compile
    jax.tree.leaves(r)[0].block_until_ready()
    _ = float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    _ = float(jnp.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:40s} {dt:8.2f} ms")
    return dt


inputs, fracs, targets, tsizes, trans, trsizes, mask = arrays
variables = {"params": state.params, "batch_stats": state.batch_stats}

# forward only (eval mode)
fwd = jax.jit(lambda v, i, tr, ts: model.apply(v, i, tr, ts, train=False))
timeit("forward (eval)", lambda: fwd(variables, inputs, trans, trsizes))

# forward train + loss
def loss_fn(params):
    lp, upd = model.apply({"params": params, "batch_stats": state.batch_stats},
                          inputs, trans, trsizes, train=True,
                          rngs={"dropout": jax.random.key(0)},
                          mutable=["batch_stats"])
    isz = (fracs * lp.shape[0]).astype(jnp.int32)
    return jnp.sum(ctc_loss(lp, isz, targets, tsizes)) / inputs.shape[0]

floss = jax.jit(loss_fn)
timeit("forward+ctc loss", lambda: floss(state.params))

g = jax.jit(jax.grad(loss_fn))
timeit("forward+loss+backward", lambda: g(state.params))

# full step
from mdd_tpu.parallel.mesh import replicated
step_fn = trainer._step_fn(True)
st = trainer.state
acc = jax.device_put(jnp.zeros(4, jnp.float32), replicated(trainer.mesh))
def full():
    global st, acc
    st, acc = step_fn(st, arrays, jax.random.key(1), acc)
    return acc
timeit("full train step", full)

# LSTM-only microbench: 4 layers worth, pallas vs scan
from mdd_tpu.ops.lstm_pallas import bilstm_pallas
from mdd_tpu.ops.lstm import bilstm
T, B, D, H = 80, 512, 768, 384
k = jax.random.key(0)
x = jax.random.normal(k, (T, B, D), jnp.bfloat16)
wih = jax.random.normal(k, (D, 4 * H), jnp.bfloat16) * 0.05
whh = jax.random.normal(k, (H, 4 * H), jnp.bfloat16) * 0.05

def lstm4(rnn, x):
    for _ in range(4):
        y = rnn(x, wih if x.shape[-1] == D else wih2, whh, wih if x.shape[-1] == D else wih2, whh)
        x = y
    return x
wih2 = jax.random.normal(k, (2 * H, 4 * H), jnp.bfloat16) * 0.05

p4 = jax.jit(lambda x: lstm4(bilstm_pallas, x))
timeit("4x bilstm pallas fwd", lambda: p4(x))
gp4 = jax.jit(jax.grad(lambda x: p4(x).astype(jnp.float32).sum()))
timeit("4x bilstm pallas fwd+bwd", lambda: gp4(x))
s4 = jax.jit(lambda x: lstm4(bilstm, x))
timeit("4x bilstm scan fwd", lambda: s4(x))
gs4 = jax.jit(jax.grad(lambda x: s4(x).astype(jnp.float32).sum()))
timeit("4x bilstm scan fwd+bwd", lambda: gs4(x))
