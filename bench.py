"""Benchmark: batched DMV inside-outside throughput (the north-star metric).

Measures sentences/sec of the full inside-outside (partition + marginals,
i.e. forward + backward) at sentence length 30, batch 256, on the
default JAX backend (TPU), and compares against a faithful CPU
re-implementation of the reference's per-width chart loop
(PyTorch, autograd-through-the-chart marginals, mirroring
ref: src/model/torch_struct/dmv.py:19-66 + helpers.py:118-157).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sentences/sec", "vs_baseline": N}
"""

from __future__ import annotations

import functools
import json
import os
import sys
import threading
import time

import numpy as np

LEN = 30
BATCH = 256
CPU_BATCH = 32  # CPU baseline measured on a slice, scaled by batch

# BENCH_SMOKE=1: tiny shapes/iterations so the FULL flow (every leg +
# report assembly) can be validated end-to-end on CPU in minutes; the
# printed numbers are meaningless, only the plumbing is under test.
SMOKE = os.environ.get("BENCH_SMOKE", "0") == "1"
if SMOKE:
    LEN, BATCH, CPU_BATCH = 8, 8, 4

# ---------------------------------------------------------------------
# Watchdog: the tunneled TPU endpoint can die silently, in which case
# the FIRST device interaction (even `import jax`, which dials at
# backend registration) futex-waits forever with zero CPU. A hung bench
# is strictly worse than a failed one — the driver would record
# nothing — so a daemon thread aborts the process with a loud stderr
# message when a stage stalls past its deadline. os._exit is required:
# the main thread is unkillable-by-exception while stuck in the dial.

_progress = {"stage": "start", "t": time.time()}


def _note(stage: str) -> None:
    _progress["stage"] = stage
    _progress["t"] = time.time()
    print(f"[bench] {stage}", file=sys.stderr, flush=True)


def _start_watchdog() -> None:
    if os.environ.get("BENCH_WATCHDOG", "1") == "0":
        return
    # first device answer within 15 min (a healthy tunnel answers the
    # probe op in seconds; compiles never start before the dial ends),
    # no stage may stall 45 min, whole bench capped at 2 h
    probe_s = int(os.environ.get("BENCH_WATCHDOG_PROBE_S", 900))
    stall_s = int(os.environ.get("BENCH_WATCHDOG_STALL_S", 2700))
    total_s = int(os.environ.get("BENCH_WATCHDOG_TOTAL_S", 7200))
    t0 = time.time()

    def watch():
        while True:
            time.sleep(15)
            now = time.time()
            stage, since = _progress["stage"], time.time() - _progress["t"]
            limit = probe_s if stage == "device_probe" else stall_s
            if since > limit or now - t0 > total_s:
                print(
                    f"[bench] FATAL: stage '{stage}' stalled {int(since)}s "
                    f"(elapsed {int(now - t0)}s) — tunnel/worker "
                    "unresponsive; aborting instead of hanging",
                    file=sys.stderr,
                    flush=True,
                )
                os._exit(3)

    threading.Thread(target=watch, daemon=True).start()


def _setup_compile_cache() -> None:
    """Persistent XLA compilation cache, same default dir the Pipeline
    uses (~/.cache/vlgae_tpu/xla). Bench compiles are identical run to
    run and a cold joint-model compile through the tunnel costs minutes
    — a rehearsal run pre-warms the driver's end-of-round run. Disable
    with BENCH_COMPILE_CACHE=0; BENCH_COMPILE_CACHE=<path> overrides."""
    import jax

    cache = os.environ.get("BENCH_COMPILE_CACHE", "1")
    if (cache.lower() in ("0", "false", "no", "off")
            or jax.config.jax_compilation_cache_dir):
        return
    path = cache if cache.lower() not in ("", "1", "true", "yes", "on") \
        else os.path.expanduser("~/.cache/vlgae_tpu/xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    print(f"[bench] compile cache: {path}", file=sys.stderr, flush=True)


def _probe_device() -> None:
    """One tiny op through the default backend, so a dead endpoint is
    caught by the watchdog here — with a clear message — rather than
    surfacing as an eternal hang inside the first real leg."""
    import jax
    import jax.numpy as jnp

    _setup_compile_cache()
    n = len(jax.devices())
    val = float(jnp.ones((8, 8)).sum())
    print(f"[bench] device probe ok: {n} device(s), sum={val}",
          file=sys.stderr, flush=True)


def diff_time(make_many, iters, repeats: int = 1):
    """Differential timing: run the scan at N and 2N iterations and take
    the difference, cancelling fixed dispatch/fetch overhead exactly
    (remote backends add ~30ms per round trip). With ``repeats`` > 1
    the best (minimum) differential is kept: throughput through the
    shared tunnel drifts up to ~20% between windows, and the minimum is
    the least-interfered measurement of the kernel's capability."""
    many_1 = make_many(iters)
    many_2 = make_many(2 * iters)
    float(many_2())  # compile+warm the longer one (shares cache shapes? no)
    float(many_1())
    d1s, d2s = [], []
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        v1 = float(many_1())
        t1 = time.perf_counter()
        v2 = float(many_2())
        t2 = time.perf_counter()
        assert np.isfinite(v1) and np.isfinite(v2)
        d1s.append(t1 - t0)
        d2s.append(t2 - t1)
    # least-interfered estimate PER LEG: differencing one slow leg
    # against one fast leg produces garbage (even negative) deltas,
    # so take each leg's own minimum before differencing
    return max(min(d2s) - min(d1s), 1e-9) / iters


def make_inputs(B, N, seed=0):
    rng = np.random.default_rng(seed)
    dec = rng.standard_normal((B, N + 1, 2, 2, 2)).astype(np.float32)
    attach = rng.standard_normal((B, N + 1, N + 1, 2)).astype(np.float32)
    lengths = np.full(B, N, np.int32)
    return dec, attach, lengths


def bench_tpu():
    import jax
    import jax.numpy as jnp

    from vlgae_tpu.ops import dmv_partition_pallas, pallas_available
    from vlgae_tpu.struct import LogSemiring, dmv_partition

    dec, attach, lengths = make_inputs(BATCH, LEN)
    dec, attach, lengths = map(jnp.asarray, (dec, attach, lengths))

    if pallas_available():
        total_fn = dmv_partition_pallas
    else:
        total_fn = lambda d, a, l: dmv_partition(d, a, l, LogSemiring)

    @jax.jit
    def inside_outside(d, a, l):
        val, grads = jax.value_and_grad(
            lambda a_: jnp.sum(total_fn(d, a_, l))
        )(a)
        # tiny reductions so a single final fetch transitively depends on
        # every iteration's full forward+backward (remote backends may
        # not honour block_until_ready)
        return jnp.sum(val) + 1e-6 * jnp.sum(grads)

    rng = np.random.default_rng(1)
    noise = jnp.asarray(
        rng.standard_normal((8,) + attach.shape).astype(np.float32) * 0.01
    )

    def make_many(iters):
        @functools.partial(jax.jit, static_argnums=())
        def many(d, a, l, noise):
            def body(acc, i):
                a_i = a + noise[i % noise.shape[0]]
                return acc + inside_outside(d, a_i, l), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(iters))
            return acc

        return lambda: many(dec, attach, lengths, noise)

    dt = diff_time(make_many, 2 if SMOKE else 128, repeats=5)
    return BATCH / dt, dt


def logaddexp_roofline():
    """Measured elementwise logaddexp throughput on this chip — the
    honest roofline for the chart DP (it is VPU/transcendental-bound,
    not MXU-bound). Returns FLOP/s at the same 6-flops-per-logaddexp
    convention as the kernels' CostEstimate."""
    import jax
    import jax.numpy as jnp

    M = 1 << 20  # 1M elements
    CHAIN = 16  # chained ops per element per step: compute-bound, not HBM
    a = jnp.linspace(-1.0, 1.0, M).reshape(1 << 10, 1 << 10)
    cs = [jnp.float32(0.01 * (k + 1)) for k in range(CHAIN)]

    def make_many(iters):
        @jax.jit
        def many(a):
            def body(acc, _):
                for c in cs:
                    acc = jnp.logaddexp(acc, acc * 0.5 + c)
                return acc - jnp.float32(CHAIN * 0.7), None

            acc, _ = jax.lax.scan(body, a, None, length=iters)
            # full reduction: every element of every step must be
            # computed (a subsampled slice lets XLA narrow the loop
            # body and report a fantasy rate)
            return jnp.sum(acc)

        return lambda: many(a)

    # long windows + best-of-3: the differential must dwarf the
    # tunnel's RTT jitter (short single-shot windows have produced 12x
    # swings in either direction), and a roofline is by definition the
    # least-interfered measurement
    dt = diff_time(make_many, 2 if SMOKE else 512, repeats=3)
    return 6.0 * CHAIN * M / dt


def bench_cpu_reference():
    """Reference-style torch CPU inside-outside (per-width python loop)."""
    import torch

    torch.set_num_threads(max(torch.get_num_threads(), 4))
    NEG = -1e12
    NOCHILD, HASCHILD = 1, 0
    LEFT, RIGHT, GO, STOP = 0, 1, 0, 1

    dec_np, attach_np, lengths_np = make_inputs(CPU_BATCH, LEN)
    dec = torch.tensor(dec_np)
    attach = torch.tensor(attach_np, requires_grad=True)
    lengths = torch.tensor(lengths_np, dtype=torch.long)

    def inside(dec, attach):
        B, N1 = attach.shape[:2]
        att_l = attach + dec[:, :, None, LEFT, :, GO]
        att_r = attach + dec[:, :, None, RIGHT, :, GO]
        # diagonal-major charts [w][B, n, 2]
        Cr = [None] * N1
        Cl = [None] * N1
        Ir = [None] * N1
        Il = [None] * N1
        Cr[0] = dec[:, :, RIGHT, :, STOP]
        Cl[0] = dec[:, :, LEFT, :, STOP]
        for w in range(1, N1):
            n = N1 - w
            terms_l, terms_r = [], []
            for t in range(w):
                c_child = Cr[t][:, :n]
                c_head = Cl[w - 1 - t][:, 1 + t: 1 + t + n]
                terms_l.append(c_child[..., NOCHILD] + c_head[..., HASCHILD])
                terms_r.append(c_child[..., HASCHILD] + c_head[..., NOCHILD])
            inner_l = torch.logsumexp(torch.stack(terms_l), 0)
            inner_r = torch.logsumexp(torch.stack(terms_r), 0)
            hs = torch.arange(w, N1)
            cs = torch.arange(0, n)
            Il[w] = inner_l[..., None] + att_l[:, hs, cs]
            Ir[w] = inner_r[..., None] + att_r[:, cs, hs]
            terms_cl, terms_cr = [], []
            for t in range(w):
                terms_cl.append(
                    Il[w - t][:, t: t + n]
                    + Cl[t][:, :n, NOCHILD][..., None]
                )
                terms_cr.append(
                    Ir[t + 1][:, :n]
                    + Cr[w - 1 - t][:, 1 + t: 1 + t + n, NOCHILD][..., None]
                )
            Cl[w] = torch.logsumexp(torch.stack(terms_cl), 0)
            cr_new = torch.logsumexp(torch.stack(terms_cr), 0)
            root_keep = lengths.eq(w)
            cr_new = torch.cat(
                [
                    torch.where(
                        root_keep[:, None], cr_new[:, 0], torch.full_like(
                            cr_new[:, 0], NEG)
                    )[:, None],
                    cr_new[:, 1:],
                ],
                dim=1,
            )
            Cr[w] = cr_new
        vals = torch.stack(
            [Cr[int(l)][b, 0, NOCHILD] for b, l in enumerate(lengths)]
        )
        return vals

    # warmup
    v = inside(dec, attach).sum()
    v.backward()
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        attach.grad = None
        v = inside(dec, attach).sum()
        v.backward()
    dt = (time.perf_counter() - t0) / iters
    return CPU_BATCH / dt


def bench_stretch(length=64, batch=1024, iters=16):
    """Stretch config: len-64 chart fills at batch 1024 (BASELINE #5).

    The kernel wrapper auto-chunks launches to <=256 lanes (larger grids
    near the VMEM ceiling have faulted the v5e worker).
    """
    import jax
    import jax.numpy as jnp

    from vlgae_tpu.ops import dmv_partition_pallas, pallas_available
    from vlgae_tpu.struct import LogSemiring, dmv_partition

    dec, attach, lengths = make_inputs(batch, length, seed=2)
    dec, attach, lengths = map(jnp.asarray, (dec, attach, lengths))
    if pallas_available():
        total_fn = dmv_partition_pallas
    else:
        total_fn = lambda d, a, l: dmv_partition(d, a, l, LogSemiring)

    def make_many(n_it):
        @jax.jit
        def many(d, a, l):
            def body(acc, i):
                val, grads = jax.value_and_grad(
                    lambda a_: jnp.sum(total_fn(d, a_ + acc * 1e-9, l))
                )(a)
                return acc + val * 1e-9 + jnp.sum(grads) * 1e-9, None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_it))
            return acc

        return lambda: many(dec, attach, lengths)

    dt = diff_time(make_many, iters, repeats=5)
    return batch / dt


def make_joint(B, L, P, vit=False, bf16=True):
    """Build the reference-scale joint model + synthetic batch.

    ``bf16=True`` is the kernel configuration (bf16 MXU matmuls; the
    fused matching kernel engages via match_kernel='auto') — since the
    round-5 accuracy A/B (scripts/ab_precision_e2e.py: uas/box-obj
    delta +0.00) this is what exp=vlgae ships. ``bf16=False`` is the
    reference-parity configuration (trainer.precision=32, f32 einsum
    matching) — both are benchmarked so BENCH numbers describe both the
    shipped and the parity systems (VERDICT r4 #1)."""
    import jax
    import jax.numpy as jnp

    from vlgae_tpu.models import (
        CompositeEmbedding, DependencyBoxRel, DependencyBoxRelConfig,
        DiscriminativeNDMV, LDNDMVConfig, MLPEncoder,
        VisBoxRelSimpleEncoder,
    )
    from vlgae_tpu.models.embedding import EmbeddingItemCfg

    N_WORD, N_TAG, N_TOKEN = 2000, 40, 500
    emb = CompositeEmbedding(items=(
        EmbeddingItemCfg("word_embedding", "word", "static",
                         n_vocab=N_WORD, embedding_dim=100),
        EmbeddingItemCfg("tag_embedding", "tag", "static",
                         n_vocab=N_TAG, embedding_dim=32),
    ))
    dep_cfg = LDNDMVConfig(hidden_size=256, mid_bottleneck=150,
                           n_token=N_TOKEN, n_tag=N_TAG)
    dep = DiscriminativeNDMV(
        cfg=dep_cfg, embedding=emb, encoder=MLPEncoder(n_hidden=256),
        token2word=tuple(i % N_WORD for i in range(N_TOKEN)),
        token2tag=tuple(i % N_TAG for i in range(N_TOKEN)),
    )
    enc_dt = jnp.bfloat16 if bf16 else jnp.float32
    if vit:
        from transformers import ViTConfig

        from vlgae_tpu.models import VisViTPatchEncoder

        img_size, patch = (64, 32) if SMOKE else (224, 32)
        vit_cfg = ViTConfig(
            hidden_size=192, num_hidden_layers=4, num_attention_heads=4,
            intermediate_size=384, image_size=img_size, patch_size=patch,
            num_channels=3,
        )
        vis_encoder = VisViTPatchEncoder(
            n_hidden=256, vit_config=vit_cfg, dtype=enc_dt)
        P = vis_encoder.n_patches
    else:
        vis_encoder = VisBoxRelSimpleEncoder(n_hidden=256, dtype=enc_dt)
    model = DependencyBoxRel(
        cfg=DependencyBoxRelConfig(match_hidden=128, bf16_matmul=bf16),
        dep_cfg=dep_cfg, dependency=dep,
        vis_encoder=vis_encoder,
        pos_for_obj=(2, 3), pos_for_rel=(4, 5), pos_for_attr=(6,),
    )
    rng = np.random.default_rng(0)
    inputs = {
        "token": jnp.asarray(rng.integers(2, N_TOKEN, (B, L)), jnp.int32),
        "word": jnp.asarray(rng.integers(2, N_WORD, (B, L)), jnp.int32),
        "tag": jnp.asarray(rng.integers(2, N_TAG, (B, L)), jnp.int32),
        "seq_len": jnp.full((B,), L, jnp.int32),
        "vis_box_mask": jnp.asarray(np.tile(np.arange(P) < (P if vit
                                    else 35), (B, 1))),
        "vis_available": jnp.ones(B, bool),
    }
    if vit:
        inputs["vis_pixels"] = jnp.asarray(
            rng.standard_normal(
                (B, vit_cfg.image_size, vit_cfg.image_size, 3)
            ), jnp.float32)
    else:
        inputs["vis_box_feat"] = jnp.asarray(
            rng.standard_normal((B, P, 2048)), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), inputs)
    return model, inputs, params


def bench_train_step(B=64, L=10, P=36, iters=64, vit=False, bf16=True):
    """Full joint-model (VLGAE) train step at the reference's default
    training scale (ref: config/data/vlparse.yaml batch<=64, len<=10,
    35 proposals): forward (3 chart DPs) + grounding loss + backward +
    Adam. Reported as sentences/sec. ``vit=True`` swaps the visual
    branch to the frozen-ViT patch grid over raw pixels (the exp=
    vlgae_vit recipe, BASELINE config #5) — P becomes the patch count
    and the 2048-d region features become [224, 224, 3] images.
    ``bf16=False`` measures the shipped f32/einsum configuration."""
    import jax
    import jax.numpy as jnp
    import optax

    from vlgae_tpu.models import loss_nll

    model, inputs, params = make_joint(B, L, P, vit=vit, bf16=bf16)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def step(params, opt_state, key):
        def loss_fn(p):
            out = model.apply(p, inputs, deterministic=False,
                              rngs={"dropout": key, "sample": key})
            dep_loss, dep_aux = loss_nll(out, inputs["seq_len"],
                                         viterbi=True)
            total, _ = model.apply(p, out, None, inputs, dep_loss, dep_aux,
                                   method=model.loss)
            return total / (B * L)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def make_many(n_it):
        @jax.jit
        def many(params, opt_state, key):
            def body(carry, i):
                p, o, acc = carry
                p, o, loss = step(p, o, jax.random.fold_in(key, i))
                return (p, o, acc + loss), None

            (p, o, acc), _ = jax.lax.scan(
                body, (params, opt_state, jnp.zeros(())), jnp.arange(n_it)
            )
            return acc

        return lambda: many(params, opt_state, jax.random.key(1))

    dt = diff_time(make_many, iters, repeats=5)
    return B / dt, dt


def bench_joint_decode(B=64, L=50, P=36, iters=8, bf16=False):
    """Batched joint grounding decode at recipe scale (BASELINE #4,
    VERDICT r4 #2): deterministic forward + on_factor grounding decode
    (map-free: the diagonal [B,Q,V] block + [B,A,Q] cross-image maxima
    — no [B,A,Q,V] tensor anywhere) + MBR dependency decode. f32 by
    default: the streamed f32 eval matching edges out the bf16 fused
    kernel here (measured same-window on v5e post exact_top_k: f32
    3.27 ms vs bf16 3.62 ms at recipe scale — the kernel's two-axis
    maxima do extra work eval doesn't need). Sentences/sec."""
    import jax
    import jax.numpy as jnp

    from vlgae_tpu.models import ldndmv_decode

    model, inputs, params = make_joint(B, L, P, bf16=bf16)
    rng = np.random.default_rng(5)
    noise = jnp.asarray(
        rng.standard_normal((4, B, P, 2048)).astype(np.float32) * 0.01
    )

    def eval_step(p, x):
        out = model.apply(p, x, deterministic=True)
        heads = ldndmv_decode(out, x["seq_len"], mbr=True)
        g = model.apply(p, out, x, method=model.decode_grounding_device)
        return (jnp.sum(heads) + jnp.sum(g["txt_to_factor_idx"])
                + jnp.sum(g["txt_to_img"]))

    def make_many(n_it):
        @jax.jit
        def many(p, x, noise):
            def body(acc, i):
                xi = dict(x)
                xi["vis_box_feat"] = x["vis_box_feat"] + noise[i % 4]
                return acc + eval_step(p, xi), None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                  jnp.arange(n_it))
            return acc

        return lambda: many(params, inputs, noise)

    dt = diff_time(make_many, 2 if SMOKE else iters, repeats=5)
    return B / dt, dt


def bench_mbr_decode(B=None, N=None, iters=32):
    """MBR decode throughput (the eval/serving path): DMV marginals by
    autograd through the chart kernel, then the DependencyCRF Viterbi
    over the summed arc marginals (ref: src/model/ldndmv.py:289-304).
    Reported as sentences/sec."""
    import jax
    import jax.numpy as jnp

    from vlgae_tpu.models.ldndmv import decode

    B = B or BATCH
    N = N or LEN
    dec, attach, lengths = make_inputs(B, N, seed=3)
    dec, attach, lengths = map(jnp.asarray, (dec, attach, lengths))
    rng = np.random.default_rng(4)
    noise = jnp.asarray(
        rng.standard_normal((4,) + attach.shape).astype(np.float32) * 0.01
    )

    def make_many(n_it):
        @jax.jit
        def many(d, a, l, noise):
            def body(acc, i):
                heads = decode(
                    {"merged_dec": d, "merged_attach": a + noise[i % 4]},
                    l, mbr=True,
                )
                return acc + jnp.sum(heads), None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                  jnp.arange(n_it))
            return acc

        return lambda: many(dec, attach, lengths, noise)

    dt = diff_time(make_many, 2 if SMOKE else iters, repeats=5)
    return B / dt


def main():
    _start_watchdog()
    _note("device_probe")
    _probe_device()
    _note("cpu_reference")
    cpu_sps = bench_cpu_reference()
    _note("inside_outside_len30")
    tpu_sps, tpu_dt = bench_tpu()

    # optional legs fail LOUD: a crashed leg reports status='failed'
    # (never a silent 0.0 the driver would read as a catastrophic
    # regression); the headline legs above still abort the whole bench.
    legs_status = {}

    def run_leg(name, fn):
        _note(name)
        try:
            val = fn()
            legs_status[name] = "ok"
            return val
        except Exception as e:  # noqa: BLE001 - leg isolation by design
            print(f"[bench] {name} leg FAILED: {e!r}", file=sys.stderr,
                  flush=True)
            legs_status[name] = f"failed: {type(e).__name__}"
            return None

    def _r(x, k=1):
        return None if x is None else round(x, k)

    train = run_leg(
        "joint_train_step",
        lambda: (bench_train_step(B=8, L=6, P=8, iters=2)
                 if SMOKE else bench_train_step()),
    )
    # production-scale joint legs (round-3 verdict #2): the exp=vlgae
    # recipe trains at max_len 50 / batch<=64 / 36 proposals
    # (ref: config/exp/vlgae.yaml:9-16) — the len10/B=64 point alone
    # left the "per-step tail amortizes" claim unmeasured
    train_vlgae = run_leg(
        "joint_train_step_vlgae_scale",
        lambda: (bench_train_step(B=8, L=12, P=8, iters=2)
                 if SMOKE else bench_train_step(B=64, L=50, P=36,
                                                iters=8)),
    )
    # the reference-parity configuration (trainer.precision=32 -> f32
    # einsum matching, kernel not engaged) at recipe scale — exp=vlgae
    # shipped this until the round-5 accuracy A/B flipped it to bf16;
    # BENCH keeps describing both configs (VERDICT r4 weak #1 / #1a)
    train_shipped = run_leg(
        "joint_train_step_shipped_f32",
        lambda: (bench_train_step(B=8, L=12, P=8, iters=2, bf16=False)
                 if SMOKE else bench_train_step(B=64, L=50, P=36,
                                                iters=8, bf16=False)),
    )
    # batched joint grounding decode (BASELINE #4's second half),
    # map-free by construction, at recipe scale in the shipped f32
    joint_dec = run_leg(
        "joint_decode",
        lambda: (bench_joint_decode(B=8, L=12, P=8, iters=2)
                 if SMOKE else bench_joint_decode(B=64, L=50, P=36,
                                                  iters=8)),
    )
    train_b256 = run_leg(
        "joint_train_step_b256",
        lambda: (bench_train_step(B=16, L=6, P=8, iters=2)
                 if SMOKE else bench_train_step(B=256, L=10, P=36,
                                                iters=32)),
    )
    # ViT-swap recipe at the stretch caption length (BASELINE #5: the
    # CLIP/ViT half): frozen 4-layer ViT over 224x224 pixels, 49 patch
    # factors, len-50 captions
    train_vit = run_leg(
        "joint_train_step_vit",
        lambda: (bench_train_step(B=4, L=6, iters=2, vit=True)
                 if SMOKE else bench_train_step(B=64, L=50, iters=4,
                                                vit=True)),
    )
    stretch_sps = run_leg(
        "stretch_len64",
        lambda: (bench_stretch(length=12, batch=16, iters=2)
                 if SMOKE else bench_stretch()),
    )
    decode_sps = run_leg("mbr_decode", bench_mbr_decode)
    roofline = run_leg("roofline", logaddexp_roofline)
    _note("report")
    # modeled FLOPs of one inside-outside at len30/b256 (the kernels'
    # CostEstimate: 12*n1^3*B forward + 24*n1^3*B backward, counting a
    # logaddexp accumulation as 6 flops)
    n1 = LEN + 1
    flops_io = 36 * n1 ** 3 * BATCH
    achieved = flops_io / tpu_dt
    result = {
        "metric": "dmv_inside_outside_len30_b256_sentences_per_sec",
        "value": round(tpu_sps, 1),
        "unit": "sentences/sec",
        "vs_baseline": round(tpu_sps / cpu_sps, 2),
        "cpu_reference_sentences_per_sec": round(cpu_sps, 1),
        "stretch_len64_b1024_sentences_per_sec": _r(stretch_sps),
        "joint_train_step_len10_b64_sentences_per_sec": _r(
            train and train[0]),
        "joint_train_step_len10_b64_ms": _r(train and train[1] * 1e3, 3),
        "joint_train_step_len50_b64_p36_sentences_per_sec": _r(
            train_vlgae and train_vlgae[0]),
        "joint_train_step_len50_b64_p36_ms": _r(
            train_vlgae and train_vlgae[1] * 1e3, 3),
        "joint_train_step_shipped_f32_len50_b64_sentences_per_sec": _r(
            train_shipped and train_shipped[0]),
        "joint_train_step_shipped_f32_len50_b64_ms": _r(
            train_shipped and train_shipped[1] * 1e3, 3),
        "joint_decode_len50_b64_p36_sentences_per_sec": _r(
            joint_dec and joint_dec[0]),
        "joint_decode_len50_b64_p36_ms": _r(
            joint_dec and joint_dec[1] * 1e3, 3),
        "joint_train_step_len10_b256_sentences_per_sec": _r(
            train_b256 and train_b256[0]),
        "joint_train_step_len10_b256_ms": _r(
            train_b256 and train_b256[1] * 1e3, 3),
        "joint_train_step_vit_len50_b64_sentences_per_sec": _r(
            train_vit and train_vit[0]),
        "joint_train_step_vit_len50_b64_ms": _r(
            train_vit and train_vit[1] * 1e3, 3),
        "mbr_decode_len30_b256_sentences_per_sec": _r(decode_sps),
        # perf observability: the DP is VPU/transcendental-bound, so the
        # honest roofline is measured logaddexp throughput, not MXU MFU
        "achieved_gflops": round(achieved / 1e9, 1),
        "logaddexp_roofline_gflops": _r(roofline and roofline / 1e9),
        "pct_of_logaddexp_roofline": round(
            100 * achieved / roofline, 1
        ) if roofline else None,
        "legs": legs_status,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
