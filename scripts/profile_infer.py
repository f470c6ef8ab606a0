"""Profile the serving-infer wide-batch saturation (VERDICT r5 #6).

BASELINE config 5: infer peaks ~830k img/s near batch 8–16k then
DECLINES (753k at 32k) while generate scales monotone to 3.49M at 131k.
The asymmetry was asserted ("the posterior path's LSTM chain
saturates") but never profiled.  This names the resource three ways:

1. batch-scaling of the FULL infer program (plain vs tile=8192 — the
   fix candidate: serve any batch at the per-chunk optimum);
2. per-component batch-scaling (encoder MLP / LSTM cell / ST gather /
   glimpse encoder / decoder / paste), each jitted standalone — the
   component whose per-image time grows past 16k is the saturating one;
3. compiled memory_analysis temp bytes (HBM working set growth).

One JSON line per measurement → runs/profile_infer.log (shell driver).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _time(fn, *args, n_warmup=2, n_timed=10):
    for _ in range(n_warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n_timed):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_timed


def main():
    from attend_infer_repeat_tpu.configs import get_config
    from attend_infer_repeat_tpu.data import load_digit_bank, make_synth_fn
    from attend_infer_repeat_tpu.models.air import AIRModel
    from attend_infer_repeat_tpu.serving import make_infer_fn
    from attend_infer_repeat_tpu.train import create_train_state

    base = get_config("serving")
    config = dataclasses.replace(
        base, model=dataclasses.replace(base.model, dtype="bfloat16"))
    cfg = config.model
    bank, _ = load_digit_bank(config.data.source, config.data.digit_size)
    synth = make_synth_fn(config.data, bank)
    key = jax.random.key(0)

    model = AIRModel(cfg, use_baseline=False)
    init_imgs = jnp.zeros((8,) + cfg.img_size)
    state = create_train_state(
        dataclasses.replace(config, train=dataclasses.replace(
            config.train, use_baseline=False)), model, init_imgs)

    # --- 1. full program: plain vs tiled ------------------------------
    infer_plain = make_infer_fn(config, model)
    infer_tiled = make_infer_fn(config, model, tile=8192)
    for bs in (8192, 16384, 32768, 65536):
        imgs, _ = synth(key, bs)
        for name, fn in (("plain", infer_plain), ("tile8192", infer_tiled)):
            dt = _time(fn, state.params, imgs, key)
            row = {"bench": f"infer_{name}", "batch_size": bs,
                   "batch_ms": round(dt * 1e3, 3),
                   "images_per_sec": round(bs / dt, 1)}
            try:
                comp = fn.lower(state.params, imgs, key).compile()
                ma = comp.memory_analysis()
                row["temp_mb"] = round(
                    getattr(ma, "temp_size_in_bytes", 0) / 1e6, 1)
            except Exception:
                pass
            print(json.dumps(row), flush=True)

    # --- 2. per-component batch scaling --------------------------------
    from attend_infer_repeat_tpu.models.modules import (
        Encoder, GlimpseDecoder, GlimpseEncoder, StepsPredictor,
        StochasticTransformParam)
    from attend_infer_repeat_tpu.ops.spatial_transformer import (
        st_gather, st_paste)
    from flax import linen as nn

    k = jax.random.key(1)
    gh, gw = cfg.glimpse_size
    H, W = cfg.img_size

    for bs in (8192, 16384, 32768, 65536):
        img = jax.random.uniform(k, (bs, H, W))
        h_vec = jax.random.uniform(k, (bs, cfg.rnn_hidden))
        zw = jnp.tile(jnp.array([0.56, 0.56, 0.1, -0.2]), (bs, 1))
        glimpse = jax.random.uniform(k, (bs, gh, gw))
        zwhat = jax.random.uniform(k, (bs, cfg.n_what))

        comps = {}
        enc = Encoder(cfg)
        pe = enc.init(k, img)
        comps["encoder"] = (jax.jit(lambda p, x: enc.apply(p, x)), pe, img)

        lstm = nn.OptimizedLSTMCell(cfg.rnn_hidden)
        lstm_in = jnp.concatenate(
            [h_vec, zwhat, zw, jnp.ones((bs, 1))], axis=-1)
        carrier = (jnp.zeros((bs, cfg.rnn_hidden)),
                   jnp.zeros((bs, cfg.rnn_hidden)))
        pl = lstm.init(k, carrier, lstm_in)
        comps["lstm"] = (jax.jit(lambda p, c, x: lstm.apply(p, c, x)),
                         pl, carrier, lstm_in)

        comps["st_gather"] = (
            jax.jit(lambda i, z: st_gather(i, z, (gh, gw))), img, zw)

        ge = GlimpseEncoder(cfg)
        pg = ge.init(k, glimpse.reshape(bs, -1))
        comps["glimpse_enc"] = (
            jax.jit(lambda p, g: ge.apply(p, g)), pg,
            glimpse.reshape(bs, -1))

        dec = GlimpseDecoder(cfg)
        pd = dec.init(k, zwhat)
        comps["decoder"] = (jax.jit(lambda p, z: dec.apply(p, z)), pd,
                            zwhat)

        comps["st_paste"] = (
            jax.jit(lambda g, z: st_paste(g, z, (H, W))), glimpse, zw)

        for name, pack in comps.items():
            fn, *args = pack
            dt = _time(fn, *args)
            print(json.dumps({
                "bench": f"component_{name}", "batch_size": bs,
                "batch_us": round(dt * 1e6, 1),
                "ns_per_image": round(dt / bs * 1e9, 2)}), flush=True)


if __name__ == "__main__":
    main()
