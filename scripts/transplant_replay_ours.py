#!/usr/bin/env python
"""Transplant bisection for the lstm_joint COST2100 11 dB divergence
(VERDICT r4 item 1): run OUR LSTM offline-training loop on controlled
combinations of {init, data, select-indices} sourced from either framework,
then evaluate the best checkpoint on the by-word joint protocol.

Variants (--init/--data/--indices each 'ref' or 'ours'):
  ref/ref/ref    our optimizer+autodiff on the reference's exact init, its
                 exact (type-2-faded) train stream and multinomial indices —
                 isolates optimizer/autodiff dynamics.
  ref/ours/ours  reference init, our data law — isolates the init law.
  ours/ref/ours  our init, reference data — isolates the data law.

Checkpoint selection (best-by-val-ser per minibatch, reference
trainer.py:482-486) uses the capture's val batches when --data ref, or our
val dataset otherwise. The final readout is the mean data-block coded BER of
the 300-block by-word joint eval at --snr on --channel (the parity cell),
plus the in-distribution aggregated val BER.

    PARITY_PLATFORM=axon PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/transplant_replay_ours.py --capture \
      /tmp/transplant/ref_capture_s0.npz --init ref --data ref --indices ref \
      --out /tmp/transplant/replay_rrr_s0.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def ref_init_to_pytree(z):
    import numpy as np
    params = {}
    for layer in range(2):
        for a, b in (("weight_ih", "w_ih"), ("weight_hh", "w_hh"),
                     ("bias_ih", "b_ih"), ("bias_hh", "b_hh")):
            params[f"{b}{layer}"] = np.asarray(
                z[f"init__lstm.{a}_l{layer}"], dtype=np.float32)
    params["w_fc"] = np.asarray(z["init__fc.weight"], dtype=np.float32)
    params["b_fc"] = np.asarray(z["init__fc.bias"], dtype=np.float32)
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capture", required=True)
    ap.add_argument("--init", choices=["ref", "ours"], required=True)
    ap.add_argument("--data", choices=["ref", "ours"], required=True)
    ap.add_argument("--indices", choices=["ref", "ours"], required=True)
    ap.add_argument("--snr", type=float, default=11.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--channel", default="cost2100")
    ap.add_argument("--fading-type", type=int, default=2,
                    help="train fading type when --data ours (2 = the "
                         "reference's effective law, 1 = rounds 1-4's)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", os.environ.get("PARITY_PLATFORM", "cpu"))
    import jax.numpy as jnp
    import numpy as np
    import optax

    from parity_campaign import cell_kwargs, cell_name, summarize

    from metaviterbinet_tpu.config import Config
    from metaviterbinet_tpu.data.dataset import ChannelDataset
    from metaviterbinet_tpu.ecc.rs import rs_decode_bits
    from metaviterbinet_tpu.evaluation.trainer import Trainer
    from metaviterbinet_tpu.models import lstm
    from metaviterbinet_tpu.ops.metrics import error_rates
    from metaviterbinet_tpu.train.losses import select_batch
    from metaviterbinet_tpu.train.optim import make_optimizer

    z = np.load(args.capture)
    kw = cell_kwargs("joint", args.snr, args.seed, args.channel)
    tag = f"{args.init[0]}{args.data[0]}{args.indices[0]}"
    kw["run_name"] = f"transplant_replay_{tag}_" + cell_name(
        "lstm", "joint", args.snr, args.seed, args.channel)
    cfg = Config(**kw)
    key = jax.random.PRNGKey(1234 + args.seed)

    # ---- init ----------------------------------------------------------
    if args.init == "ref":
        params = jax.tree.map(jnp.asarray, ref_init_to_pytree(z))
    else:
        key, k = jax.random.split(key)
        params = lstm.init_params(k)

    # ---- data ----------------------------------------------------------
    n_mb = cfg.train_minibatch_num
    if args.data == "ref":
        train_tx = jnp.asarray(z["train_tx"], jnp.float32)   # [25,300,120]
        train_rx = jnp.asarray(z["train_rx"], jnp.float32)   # [25,300,136]
        val_tx = jnp.asarray(z["val_tx"], jnp.float32)
        val_rx = jnp.asarray(z["val_rx"], jnp.float32)
    else:
        tcfg = cfg.replace(fading_taps_type=args.fading_type)
        tds = ChannelDataset(tcfg, "train")
        vds = ChannelDataset(cfg, "val")  # val channel = the cell's (cost2100)
        ttx, trx, vtx, vrx = [], [], [], []
        for _ in range(n_mb):
            a, b = tds.get(args.snr, cfg.gamma)
            ttx.append(a), trx.append(b)
            a, b = vds.get(args.snr, cfg.gamma)
            vtx.append(a), vrx.append(b)
        train_tx, train_rx = jnp.stack(ttx), jnp.stack(trx)
        val_tx, val_rx = jnp.stack(vtx), jnp.stack(vrx)

    # ---- select indices ------------------------------------------------
    n_words, blen = train_tx.shape[1], train_tx.shape[2]
    mbs = cfg.train_minibatch_size
    if args.indices == "ref":
        sel_idx = jnp.asarray(z["sel_idx"], jnp.int32)       # [25,300,32]
    else:
        key, k = jax.random.split(key)
        ks = jax.random.split(k, n_mb * n_words).reshape(n_mb, n_words, 2)
        sel_idx = jax.vmap(jax.vmap(
            lambda kk: select_batch(kk, blen, mbs)))(ks).astype(jnp.int32)

    # ---- the training sweep (reference trainer.py:455-505 semantics:
    # one Adam step per word, CE over the subsampled bit labels) ---------
    optimizer = make_optimizer(cfg.optimizer_type, cfg.lr, cfg.clip_grad_norm)

    def word_loss(params, rx, tx, idx):
        logits = lstm.score(params, rx[None])[0]             # [136, 2]
        labels = tx.astype(jnp.int32)                        # [120]
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                logits[idx], labels[idx]))

    @jax.jit
    def sweep(params, opt_state, rx_words, tx_words, idxs):
        def step(carry, inp):
            params, opt_state = carry
            rx, tx, idx = inp
            loss, grads = jax.value_and_grad(word_loss)(params, rx, tx, idx)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), (rx_words, tx_words, idxs))
        return params, opt_state, jnp.sum(losses)

    di = jnp.asarray(cfg.data_indices("val"))

    @jax.jit
    def val_ser(params, vtx, vrx):
        det = lstm.detect(params, vrx)
        dec, _ = rs_decode_bits(det, cfg.n_symbols)
        return error_rates(dec[di], vtx[di])[0]

    opt_state = optimizer.init(params)
    best = (np.inf, params)
    history = []
    for m in range(n_mb):
        params, opt_state, loss = sweep(
            params, opt_state, train_rx[m], train_tx[m], sel_idx[m])
        ser = float(val_ser(params, val_tx[m], val_rx[m]))
        history.append(ser)
        if ser < best[0]:
            best = (ser, params)
        print(f"minibatch {m + 1}: val ser {ser:.5f} loss {float(loss):.3f}",
              flush=True)

    # ---- final readout: the parity cell's by-word joint eval -----------
    t = Trainer(cfg, "lstm",
                weights_dir=f"/tmp/ours_weights/{kw['run_name']}",
                verbose=False)
    t.params = best[1]
    sers = np.asarray(t.eval_by_word(args.snr, cfg.gamma), dtype=np.float64)
    cell = summarize(sers, np.asarray(cfg.data_indices("val")), "joint")
    out = {
        "variant": {"init": args.init, "data": args.data,
                    "indices": args.indices,
                    "fading_type_for_ours_data": args.fading_type,
                    "capture": os.path.basename(args.capture)},
        "best_val_ser": best[0],
        "val_ser_history": history,
        "byword": cell,
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["byword"]))
    print("saved ->", args.out)


if __name__ == "__main__":
    main()
