"""The online by-word adaptation engine, fused into one on-device program.

Reference semantics (python_code/trainers/trainer.py:267-354 `eval_by_word`):
for each of the 300 transmission blocks — detect, RS-decode, score SER,
re-encode decisions into pseudo-labels, gate on `ser <= ser_thresh` into a
buffer, periodically MAML-adapt from buffer (support, query) pairs, and run
self-supervised SGD steps on the newest confident word.  The reference
crosses GPU→CPU twice per block (RS decode + encode) and mutates Python-side
model state; here the whole loop is a single `lax.scan` over blocks carrying
`(params, opt_state, saved_params, buffer, key)` — zero host round-trips.

Replicated quirks (SURVEY.md quirk ledger):
  - the buffer pseudo-label is the RAW detected word when 0 < ser <= thresh,
    and the re-encoded word only when ser == 0 or for pilots
    (trainer.py:319-325: `detected_word if ser > 0 else encoded_word`);
  - one optimizer state is shared by online SGD and the meta outer step
    (both use `self.optimizer`);
  - meta adaptation fires when `count % meta_subframes == 0 and
    count >= meta_subframes and len(buffer) > 2`;
  - support indices wrap negatively through the buffer end at j_hat = 0
    (torch negative indexing), replicated with mod-n_valid arithmetic;
  - sampled query indices are deduped per meta iteration via torch.unique
    (trainer.py:336-338), which also sorts ascending — duplicate draws
    perform no update (common when the buffer is young);
  - SER is scored against the true transmitted word (also used as the
    confidence gate, trainer.py:301,319);
  - with `buffer_empty=False` the buffer starts full of train-channel words
    and keeps fixed length (pop-front), i.e. a ring buffer.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from metaviterbinet_tpu.config import Config
from metaviterbinet_tpu.ecc.rs import rs_decode_bits, rs_encode_bits
from metaviterbinet_tpu.train.meta import sorted_unique_mask


class OnlineResult(NamedTuple):
    ser_by_word: jnp.ndarray      # [n_words] SER per block (0 at pilots)
    params: Any                   # final adapted params
    n_buffer: jnp.ndarray         # final buffer fill


@dataclass(frozen=True)
class _Plan:
    """Static switches compiled into the engine (one engine per plan)."""
    self_supervised: bool
    online_meta: bool
    use_ecc: bool
    trainable: bool


def make_online_engine(
    cfg: Config,
    detect_fn: Callable,               # (params, rx [1,T], h [1,L]) -> bits [1,T]
    loss_fn: Optional[Callable] = None,    # (params, rx, tx_coded) -> scalar
    init_fn: Optional[Callable] = None,    # (key) -> params, for weights_init='random'
):
    """Build `run(params, tx_words, rx_words, h_words, key, ...)` jitted once.

    tx_words: [n_words, block_length] true info bits (SER scoring + pilots).
    rx_words: [n_words, T] received samples.
    h_words:  [n_words, L] decoder-side CSI per block (used by VA only).
    """
    plan = _Plan(
        self_supervised=bool(cfg.self_supervised),
        online_meta=bool(cfg.online_meta),
        use_ecc=bool(cfg.use_ecc),
        trainable=loss_fn is not None,
    )
    nsym = cfg.n_symbols
    subframes = cfg.subframes_in_frame
    thresh = cfg.ser_thresh
    cap = cfg.buffer_capacity
    w = cfg.window_size
    optimizer = None
    if plan.trainable and (plan.self_supervised or plan.online_meta):
        from metaviterbinet_tpu.train.optim import make_optimizer
        optimizer = make_optimizer(cfg.optimizer_type, cfg.lr, cfg.clip_grad_norm)

    def detect_decode_score(params, rx, tx, h, count):
        """Detect one block; return (ser, label, detected)."""
        detected = detect_fn(params, rx[None], h[None])[0]  # [T]
        is_data = (count % subframes) != 0
        if plan.use_ecc:
            decoded, _ = rs_decode_bits(detected, nsym)
        else:
            decoded = detected[: tx.shape[0]]
        ser = jnp.where(
            is_data, jnp.mean((decoded != tx).astype(jnp.float32)), 0.0
        )
        # pseudo-label: raw detections when imperfect-but-confident, else the
        # re-encoding of the (decoded|pilot-true) word
        source = jnp.where(is_data, decoded, tx.astype(decoded.dtype))
        if plan.use_ecc:
            enc = rs_encode_bits(source, nsym).astype(rx.dtype)
        else:
            enc = source.astype(rx.dtype)
        label = jnp.where(is_data & (ser > 0), detected.astype(rx.dtype), enc)
        return ser, label, detected

    # ---- self-supervised inner trainer (reference *_trainer.online_training) --
    # loss_fn(params, rx, tx, key): the key drives the per-step select_batch
    # subsampling of the non-meta trainers (vnet_trainer.py:45, fresh
    # torch.multinomial draw per run_train_loop call); meta losses ignore it.
    def sgd_steps(params, opt_state, rx, label, key):
        def step(carry, k):
            p, o = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, rx[None], label[None], k)
            updates, o = optimizer.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), loss

        keys = jax.random.split(key, cfg.self_supervised_iterations)
        (params, opt_state), _ = jax.lax.scan(step, (params, opt_state), keys)
        return params, opt_state

    # ---- MAML adaptation from the buffer (reference trainer.py:334-342) ------
    def maml_outer_loss(params, s_rx, s_tx, q_rx, q_tx):
        inner_grads = jax.grad(loss_fn)(params, s_rx, s_tx, None)
        if not cfg.MAML:
            inner_grads = jax.tree_util.tree_map(jax.lax.stop_gradient, inner_grads)
        updated = jax.tree_util.tree_map(
            lambda p, g: p - cfg.meta_lr * g, params, inner_grads
        )
        return loss_fn(updated, q_rx, q_tx, None)

    def meta_adapt(params, opt_state, buf_rx, buf_tx, start, n_valid, key):
        def iteration(carry, key_i):
            params, opt_state = carry
            j_hats = jax.random.randint(
                key_i, (cfg.meta_j_num,), 0, jnp.maximum(n_valid - 2, 1)
            )
            # the reference takes torch.unique of the draws (trainer.py:336-338),
            # which sorts ascending AND drops duplicates — so with a young
            # buffer (small n_valid) fewer than meta_j_num updates run per
            # iteration
            j_hats, fresh = sorted_unique_mask(j_hats)

            def pair_step(carry, inp):
                j_hat, is_fresh = inp

                def do_pair(carry):
                    params, opt_state = carry
                    logical_s = (j_hat + jnp.arange(-w, 0)) % jnp.maximum(n_valid, 1)
                    phys_s = (start + logical_s) % cap
                    phys_q = (start + j_hat[None]) % cap
                    _, meta_grads = jax.value_and_grad(maml_outer_loss)(
                        params, buf_rx[phys_s], buf_tx[phys_s],
                        buf_rx[phys_q], buf_tx[phys_q],
                    )
                    updates, opt_state = optimizer.update(meta_grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return params, opt_state

                carry = jax.lax.cond(is_fresh, do_pair, lambda c: c, carry)
                return carry, None

            (params, opt_state), _ = jax.lax.scan(
                pair_step, (params, opt_state), (j_hats, fresh)
            )
            return (params, opt_state), None

        keys = jax.random.split(key, cfg.meta_train_iterations)
        (params, opt_state), _ = jax.lax.scan(iteration, (params, opt_state), keys)
        return params, opt_state

    def run(
        params,
        tx_words: jnp.ndarray,
        rx_words: jnp.ndarray,
        h_words: jnp.ndarray,
        key,
        meta_init_params=None,
        init_buffer_rx=None,
        init_buffer_tx=None,
    ) -> OnlineResult:
        n_words, T = rx_words.shape
        if params is None:
            params = {}
        if meta_init_params is None:
            meta_init_params = params

        if init_buffer_rx is not None:
            # buffer starts full (reference buffer_empty=False path)
            n0 = init_buffer_rx.shape[0]
            if n0 > cap:
                raise ValueError(
                    f"init buffer ({n0} words) exceeds buffer_capacity ({cap}); "
                    "raise Config.buffer_capacity")
            pad = cap - n0
            buf_rx0 = jnp.concatenate(
                [init_buffer_rx, jnp.zeros((pad, T), rx_words.dtype)]
            )
            buf_tx0 = jnp.concatenate(
                [init_buffer_tx, jnp.zeros((pad, T), rx_words.dtype)]
            )
            n_valid0, ring = jnp.int32(n0), True
        else:
            buf_rx0 = jnp.zeros((cap, T), rx_words.dtype)
            buf_tx0 = jnp.zeros((cap, T), rx_words.dtype)
            n_valid0, ring = jnp.int32(0), False

        opt_state0 = optimizer.init(params) if optimizer is not None else ()

        def body(carry, inp):
            params, opt_state, saved_params, buf_rx, buf_tx, start, n_valid, key = carry
            count, tx, rx, h = inp

            ser, label, _ = detect_decode_score(params, rx, tx, h, count)
            gate = ser <= thresh

            # ---- buffer append (ring when pre-filled) ----
            def do_append(args):
                buf_rx, buf_tx, start, n_valid = args
                slot = (start + n_valid) % cap
                buf_rx = jax.lax.dynamic_update_slice(buf_rx, rx[None], (slot, 0))
                buf_tx = jax.lax.dynamic_update_slice(buf_tx, label[None], (slot, 0))
                if ring:
                    start = (start + 1) % cap
                else:
                    # past capacity, degrade gracefully to drop-oldest: the
                    # slot above IS the oldest entry when full, so advance
                    # start to keep the logical order intact (the reference
                    # buffer grows unboundedly, trainer.py:320-325; a fixed
                    # ring over the newest `cap` words is the static-shape
                    # equivalent)
                    full = n_valid >= cap
                    start = jnp.where(full, (start + 1) % cap, start)
                    n_valid = jnp.minimum(n_valid + 1, cap)
                return buf_rx, buf_tx, start, n_valid

            buf_rx, buf_tx, start, n_valid = jax.lax.cond(
                gate, do_append, lambda a: a, (buf_rx, buf_tx, start, n_valid)
            )

            if plan.online_meta and plan.trainable:
                key, k_init, k_meta = jax.random.split(key, 3)
                do_meta = (
                    (count % cfg.meta_subframes == 0)
                    & (count >= cfg.meta_subframes)
                    & (n_valid > 2)
                )

                def run_meta(args):
                    params, opt_state, saved_params = args
                    if cfg.weights_init == "last_frame":
                        params = saved_params
                    elif cfg.weights_init == "random":
                        params = init_fn(k_init)
                        opt_state = optimizer.init(params)
                    elif cfg.weights_init == "meta_training":
                        params = meta_init_params
                    else:
                        raise ValueError(f"No such weights init: {cfg.weights_init}")
                    params, opt_state = meta_adapt(
                        params, opt_state, buf_rx, buf_tx, start, n_valid, k_meta
                    )
                    return params, opt_state, params

                params, opt_state, saved_params = jax.lax.cond(
                    do_meta, run_meta, lambda a: a, (params, opt_state, saved_params)
                )

            if plan.self_supervised and plan.trainable:
                key, k_ss = jax.random.split(key)

                def run_ss(args):
                    params, opt_state = args
                    if plan.online_meta:
                        # META trainers restore the meta-initialized weights
                        # before adapting (metavnet_trainer.py:59)
                        params = saved_params
                    return sgd_steps(params, opt_state, rx, label, k_ss)

                params, opt_state = jax.lax.cond(
                    gate, run_ss, lambda a: a, (params, opt_state)
                )

            carry = (params, opt_state, saved_params, buf_rx, buf_tx, start, n_valid, key)
            return carry, ser

        counts = jnp.arange(n_words)
        carry0 = (params, opt_state0, params, buf_rx0, buf_tx0, jnp.int32(0), n_valid0, key)
        (params, _, _, _, _, _, n_valid, _), sers = jax.lax.scan(
            body, carry0, (counts, tx_words, rx_words, h_words)
        )
        return OnlineResult(ser_by_word=sers, params=params, n_buffer=n_valid)

    return jax.jit(run)
