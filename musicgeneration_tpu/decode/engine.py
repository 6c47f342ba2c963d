"""KV-cached autoregressive generation as one compiled lax.scan.

Two phases, both on device:
  1. prefill — teacher-force the prompt through `decode_step` under scan,
     filling the KV cache (prompt logits are discarded except the last),
  2. generate — scan `steps` times: sample from the last logits, feed the
     token back, update the cache.

Contrast with the reference (MusicTransformer/network.py:44-80): per token
it re-runs the FULL prefix forward (no cache, O(L^2) per token, Python
loop, host-device sync per step, progress-bar in the hot loop). Here the
entire continuation is a single XLA program: O(L) per token, zero host
round-trips.

Works with any model exposing `init_cache(batch, cache_len)` and
`decode_step(token, cache, t) -> (logits, cache)` (MusicTransformer, the
GRU LMs wrap their recurrent state in the same interface).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from .sampling import SamplingParams, sample_logits


@dataclasses.dataclass(frozen=True)
class DecodeParams:
    max_len: int                  # cache length (prompt + generated)
    steps: int                    # tokens to generate
    sampling: SamplingParams = SamplingParams()
    # opt-in: run generation as chunked whole-loop Pallas megakernels
    # (ops/pallas_decode_loop.py). MEASURED AT PARITY with the per-step
    # fused kernel at the flagship config (47.4k vs 49.7k tok/s B8 —
    # the per-step weight copies were already overlapped by XLA, and
    # the in-VMEM chunk attention block cancels the launch savings), so
    # the default stays off; kept for larger-d_model experiments where
    # per-step weight traffic grows quadratically.
    # REPRODUCIBILITY: greedy decoding is token-identical to the scan
    # path, but SAMPLED runs are NOT — the loop kernel draws from the
    # on-core TPU PRNG seeded per chunk (fold_in of the caller's key),
    # a different stream than jax.random.categorical, so the same rng
    # key yields different (identically distributed) tokens.
    use_loop_kernel: bool = False
    # per-launch bulk KV prefix for the loop kernel (measured NEGATIVE
    # on v5e — see ops/pallas_decode_loop.py; None = off). Threaded
    # here (a static jit arg) so flips genuinely retrace: an env-only
    # switch read at trace time is invisible to generate()'s jit cache
    loop_bulk: Optional[bool] = None


def align_cache_len(model, max_len: int) -> int:
    """Block-align a KV-cache length for the fused decode kernels.

    An odd cache length forces the kernel selection to a single
    whole-cache block, which overflows scoped VMEM past small batches
    (found at CP B32: p+steps=520) and is slow where it fits. Round up
    to a 128-row multiple; models whose relative table is smaller fall
    back to the bf16 sublane tile (16 — Mosaic rejects DMA slices of
    non-16-multiple cache rows on hardware). The 16-row fallback may
    exceed a non-16-multiple max_seq by up to 15 rows: harmless padding
    (init_cache takes cache_len independently, and decode positions
    stay bounded by the p+steps <= max_seq check), where returning the
    raw max_len would hand the selection a non-16-multiple length.
    Models decoding through the XLA path are returned unchanged — that
    path reads every cache row per step, so padding is pure waste
    there."""
    if max_len % 128 == 0:
        return max_len
    if not getattr(model, "_decode_fused", lambda: False)():
        return max_len
    max_seq = getattr(model, "max_seq", 1 << 30)
    aligned = -(-max_len // 128) * 128
    if aligned > max_seq:
        aligned = -(-max_len // 16) * 16
    return aligned


def expand_controls(controls: jnp.ndarray, steps: int) -> jnp.ndarray:
    """[1 or S, B, C] -> [steps, B, C] (reference PerformanceRNN
    network.py:97-104): a single control repeats at every step; a
    per-step sequence is truncated to `steps` (edge-repeating its last
    row if one short — our engine consumes one extra trailing control
    for the final, unused logits)."""
    assert controls.ndim == 3
    s = controls.shape[0]
    if s == 1:
        return jnp.broadcast_to(controls,
                                (steps,) + controls.shape[1:])
    idx = jnp.minimum(jnp.arange(steps), s - 1)
    return controls[idx]


def _prefill(model, params, tokens, cache, start_t, controls=None,
             prompt_len=None):
    """Scan the prompt through decode_step. tokens: [B, P];
    controls: optional [P, B, C] per-position conditioning.

    prompt_len: optional DYNAMIC true length (bucketed prompts padded to
    the static P): steps past it leave the cache untouched, and the
    returned last-logits come from step prompt_len-1 — so one compiled
    scan serves every true length in the bucket."""

    def body(carry, inp):
        cache, t = carry
        if controls is None:
            tok, args = inp, ()
        else:
            tok, ctrl = inp
            args = (ctrl,)
        logits, new_cache = model.apply({"params": params}, tok, cache, t,
                                        *args, method=model.decode_step)
        if prompt_len is None:
            return (new_cache, t + 1), logits
        valid = t < prompt_len
        new_cache = jax.tree.map(
            lambda n, o: jnp.where(valid, n, o), new_cache, cache)
        return (new_cache, t + 1), logits

    xs = tokens.T if controls is None else (tokens.T, controls)
    (cache, t), logits = jax.lax.scan(
        body, (cache, start_t), xs)  # scan over time-major
    if prompt_len is None:
        return cache, t, logits[-1]
    last = jax.lax.dynamic_index_in_dim(
        logits, prompt_len - 1 - start_t, axis=0, keepdims=False)
    return cache, start_t + prompt_len, last


@functools.partial(
    jax.jit, static_argnames=("model", "decode_params"))
def generate(
    model,
    params,
    prompt: jnp.ndarray,
    rng: jax.Array,
    decode_params: DecodeParams,
    controls: Optional[jnp.ndarray] = None,
    cache0: Optional[Any] = None,
    prompt_len: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """prompt: [B, P] int32 -> generated tokens [B, steps] int32.

    The full prompt+generation must fit in decode_params.max_len.

    controls: optional [1 or S, B, C] conditioning, threaded into every
    decode_step as its 4th argument (PerformanceRNN generate.py:103-131
    semantics: one control repeats, a sequence is consumed per step).
    cache0: optional pre-built cache (e.g. PerformanceRNN's latent-derived
    hidden via init_cache(init=z), matching init_to_hidden at
    network.py:89-95); defaults to model.init_cache(batch, max_len).
    prompt_len: optional DYNAMIC scalar — the true prompt length when
    `prompt` is padded to a static bucket (pad MusicTransformer prompts
    with pad_id; RNN prompt padding is gated off the state). One compile
    then serves every prime length in the bucket.
    """
    b, p = prompt.shape
    dp = decode_params
    if p + dp.steps > dp.max_len:
        raise ValueError(
            f"prompt ({p}) + steps ({dp.steps}) exceeds cache max_len "
            f"({dp.max_len}); the KV cache would overflow")
    max_seq = getattr(model, "max_seq", None)
    if max_seq is not None and p + dp.steps > max_seq:
        # positional/relative tables end at max_seq; past it the fused
        # kernel would DMA out-of-range E rows (a chip fault on TPU,
        # found the hard way) and the XLA path would silently clamp
        # positions. Long continuations go through generate_sliding.
        raise ValueError(
            f"prompt ({p}) + steps ({dp.steps}) exceeds the model's "
            f"max_seq ({max_seq}); use generate_sliding for unbounded "
            "continuations")
    # block-align the KV cache length for the fused kernels (no-op for
    # the XLA decode path; see align_cache_len)
    cache_len = align_cache_len(model, dp.max_len)
    if controls is not None:
        if prompt_len is not None:
            raise ValueError("controls + bucketed prompt_len are not "
                             "supported together (control/step alignment "
                             "assumes the unpadded prompt)")
        controls = expand_controls(controls, p + dp.steps)
        ctrl_prompt, ctrl_gen = controls[:p], controls[p:]
    if controls is None and cache0 is None and hasattr(model, "prefill"):
        # one-pass parallel prompt ingestion (MusicTransformer)
        if prompt_len is None:
            last_logits, cache = model.apply(
                {"params": params}, prompt, cache_len,
                method=model.prefill)
            t = jnp.int32(p)
        else:
            last_logits, cache = model.apply(
                {"params": params}, prompt, cache_len, prompt_len - 1,
                method=model.prefill)
            t = jnp.asarray(prompt_len, jnp.int32)
    else:
        cache = (cache0 if cache0 is not None else
                 model.apply({"params": params}, b, cache_len,
                             method=model.init_cache))
        cache, t, last_logits = _prefill(
            model, params, prompt, cache, jnp.int32(0),
            controls=None if controls is None else ctrl_prompt,
            prompt_len=prompt_len)

    sp = dp.sampling

    def _loop_kernel_fits() -> bool:
        # the chunk megakernel has no layer-grid/streaming variant: ALL
        # stacked weights + embed/head/pos/E + the chunk K/V buffers
        # must be VMEM-resident, so it is only eligible where the
        # RESIDENT step kernel is (d512+ models decode through the
        # grid/stream per-step kernels). The footprint estimate is the
        # loop kernel's own (decode_loop_vmem_bytes — includes the
        # embed/pos/head/chunk terms the step-kernel estimate omits).
        from ..ops.pallas_decode_loop import decode_loop_vmem_bytes
        try:
            return decode_loop_vmem_bytes(
                model.num_layers, model.d_model, model.vocab_size,
                cache_len, model.d_model // model.num_heads,
                batch=b) < 14 * 1024 * 1024
        except AttributeError:
            return False

    if (dp.use_loop_kernel and controls is None and cache0 is None
            and hasattr(model, "decode_loop")
            and getattr(model, "_decode_fused", lambda: False)()
            and _loop_kernel_fits()
            # the on-core PRNG has no interpret-mode lowering: off-TPU
            # (tests force decode_impl="fused") only greedy is eligible
            and (sp.greedy or jax.default_backend() == "tpu")):
        # whole-generation megakernel (ops/pallas_decode_loop.py): all
        # `steps` tokens in one kernel call, weights VMEM-resident.
        # Stochastic sampling (temperature / top-k / nucleus — the
        # masking runs on-core with exact XLA-sampler set semantics)
        # uses the on-core PRNG: same categorical distribution as
        # jax.random.categorical, different stream; greedy is
        # token-identical to the scan path.
        tokens, _ = model.apply(
            {"params": params}, last_logits, t, rng, cache, dp.steps,
            sp.temperature, sp.greedy, sp.top_k, sp.top_p,
            bulk=dp.loop_bulk, method=model.decode_loop)
        return tokens

    def body(carry, inp):
        cache, t, logits = carry
        if controls is None:
            rng_i, args = inp, ()
        else:
            rng_i, ctrl = inp
            args = (ctrl,)
        token = sample_logits(rng_i, logits, dp.sampling)
        new_logits, cache = model.apply({"params": params}, token, cache, t,
                                        *args, method=model.decode_step)
        return (cache, t + 1, new_logits), token

    rngs = jax.random.split(rng, dp.steps)
    xs = rngs if controls is None else (rngs, ctrl_gen)
    _, tokens = jax.lax.scan(body, (cache, t, last_logits), xs)
    return tokens.T  # [B, steps]


@functools.lru_cache(maxsize=32)
def _dp_generate_fn(model, decode_params, mesh, ctrl_ndim: int,
                    cache_struct, has_prompt_len: bool):
    """Build (and cache) the jitted shard-mapped decode program for one
    (model, decode config, mesh, argument-shape signature)."""
    from jax.sharding import PartitionSpec as P

    def shard_fn(params, prompt, rng, controls, cache0, prompt_len):
        # independent stream per shard: distributions match the
        # single-device sampler, token sequences don't (greedy runs
        # ignore rng entirely and ARE token-identical)
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        return generate(model, params, prompt, rng, decode_params,
                        controls, cache0, prompt_len)

    # controls are [S, B, C] (batch axis 1); caches shard their batch
    # axis: [L, B, H] hidden stacks at axis 1 (RNN cache0)
    ctrl_spec = (None if ctrl_ndim == 0
                 else P(*([None, "data"] + [None] * (ctrl_ndim - 2))))
    if cache_struct is None:
        cache_spec = None
    else:
        # batch rides axis 1 of every >=2-D cache leaf ([L, B, ...]
        # hidden stacks); scalar/1-D leaves (step counters etc.) carry
        # no batch axis and must be replicated, not sliced
        cache_spec = jax.tree.unflatten(
            cache_struct[0],
            [P() if nd < 2
             else P(*([None, "data"] + [None] * (nd - 2)))
             for nd in cache_struct[1]])
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("data"), P(), ctrl_spec, cache_spec,
                  None if not has_prompt_len else P()),
        out_specs=P("data"),
        check_vma=False)
    return jax.jit(fn)


def generate_dp(model, params, prompt, rng, decode_params: DecodeParams,
                mesh, controls=None, cache0=None, prompt_len=None):
    """Data-parallel batched decode over the mesh's 'data' axis.

    The serving-side counterpart of the trainer's dp axis (SURVEY.md §5
    distributed row; the reference's only analogue is the dormant
    DataParallel in MusicTransformer/parallel.py:69-98): batch rows are
    sharded over 'data', params replicated, and every shard runs the
    same compiled KV-cached decode scan (fused Pallas kernels included —
    shard_map hands each device its own B/dp-row kernel invocation, the
    same composition the ring-attention kernels use; the fused kernel
    under shard_map is token-equality-validated ON the real chip with a
    1-device mesh, and multi-shard partitioning on the 8-virtual-device
    CPU mesh — a multi-chip ICI run is impossible in this 1-chip
    environment). There are no collectives in the decode loop, so
    throughput scales linearly with the axis size.

    Greedy decoding is token-identical to the single-device engine;
    sampled runs fold the shard index into the rng (independent streams,
    same distribution). Requires batch % mesh.shape['data'] == 0.
    """
    n_data = mesh.shape["data"]
    if prompt.shape[0] % n_data:
        raise ValueError(
            f"batch {prompt.shape[0]} not divisible by the data axis "
            f"({n_data})")
    if cache0 is None:
        cache_struct = None
    else:
        leaves, treedef = jax.tree.flatten(cache0)
        cache_struct = (treedef, tuple(x.ndim for x in leaves))
    fn = _dp_generate_fn(
        model, decode_params, mesh,
        0 if controls is None else controls.ndim, cache_struct,
        prompt_len is not None)
    return fn(params, prompt, rng, controls, cache0, prompt_len)


def generate_tp(model, params, prompt, rng, decode_params: DecodeParams,
                mesh, controls=None, cache0=None, prompt_len=None):
    """Tensor-parallel decode: attention heads / FFN hidden sharded over
    the mesh's 'model' axis (optionally composed with 'data' batch
    sharding — a dp x tp serving mesh).

    The decode scan runs under plain jit with sharded inputs: the same
    name-rule parameter shardings the trainer uses (parallel/mesh.py —
    Wq/Wk/Wv split their output dim, so Q/K/V and the KV cache shard by
    head; fc/ffn_suf split their input dim, so XLA inserts the psum that
    re-replicates logits). Sampling then sees identical logits on every
    device and the token stream is bit-identical to the single-device
    engine (equality-locked in tests/test_multichip_decode.py).

    The fused Pallas decode kernels are opaque to the SPMD partitioner,
    so TP decoding requires the XLA decode path: construct the model
    with decode_impl="xla" (the per-device matmuls are what TP is
    sharding anyway; the fused kernel's wins come from single-chip
    latency, the regime where generate()/generate_dp apply). Heads must
    divide the 'model' axis size.

    The reference has no tensor-parallel anything; this is the serving
    analogue of the trainer's tp axis (SURVEY.md §5 distributed row).
    """
    if "model" not in mesh.shape:
        raise ValueError("generate_tp needs a mesh with a 'model' axis "
                         f"(got axes {tuple(mesh.shape)})")
    n_model = mesh.shape["model"]
    # the 'data' axis is optional: a pure-TP Mesh(devices, ('model',))
    # replicates the batch
    n_data = mesh.shape.get("data", 1)
    if getattr(model, "_decode_fused", lambda: False)():
        raise ValueError(
            "generate_tp shards the XLA decode path; build the model "
            'with decode_impl="xla" (the fused Pallas kernels cannot '
            "be auto-partitioned over 'model')")
    heads = getattr(model, "num_heads", None)
    if heads is not None and heads % n_model:
        raise ValueError(f"num_heads={heads} not divisible by the "
                         f"model axis ({n_model})")
    if prompt.shape[0] % n_data:
        raise ValueError(f"batch {prompt.shape[0]} not divisible by the "
                         f"data axis ({n_data})")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import param_shardings

    params = jax.device_put(params, param_shardings(mesh, params))
    prompt_spec = P("data", None) if "data" in mesh.shape else P()
    prompt = jax.device_put(prompt, NamedSharding(mesh, prompt_spec))
    rng = jax.device_put(rng, NamedSharding(mesh, P()))
    return generate(model, params, prompt, rng, decode_params,
                    controls, cache0, prompt_len)


def generate_events(model, params, prompt_ids, rng, steps: int,
                    max_len: Optional[int] = None,
                    sampling: SamplingParams = SamplingParams(),
                    controls=None, cache0=None):
    """Host-friendly wrapper: 1D numpy prompt -> 1D numpy continuation.

    controls: optional [1 or S, C] (batch dim added here)."""
    import numpy as np

    prompt = jnp.asarray(np.asarray(prompt_ids, np.int32))[None]
    max_len = max_len or (prompt.shape[1] + steps)
    dp = DecodeParams(max_len=max_len, steps=steps, sampling=sampling)
    if controls is not None:
        controls = jnp.asarray(np.asarray(controls, np.float32))[:, None, :]
    out = generate(model, params, prompt, rng, dp, controls, cache0)
    return np.asarray(out[0])


def generate_sliding(model, params, prompt: jnp.ndarray, rng: jax.Array,
                     steps: int, window: int = 512,
                     sampling: SamplingParams = SamplingParams()):
    """Unbounded-length generation via window re-priming.

    The reference generates arbitrarily long sequences by truncating the
    context to threshold_len=500 and re-forwarding the WHOLE window per
    token (network.py:52-78, config.py:21). Here: generate in cached
    chunks; when the cache fills, re-prime it once from the last
    `window` tokens and continue — O(window) re-prime cost per
    `window` generated tokens instead of per token.

    prompt: [B, P]; returns [B, steps].
    """
    import numpy as np

    ms = getattr(model, "max_seq", None)
    if ms is not None and 2 * window > ms:
        raise ValueError(
            f"window ({window}) must be <= max_seq//2 ({ms // 2}): the "
            "sliding cache spans 2*window positions, all of which must "
            "stay inside the model's position/E tables")
    b = prompt.shape[0]
    max_len = 2 * window
    produced = []
    ctx = np.asarray(prompt, np.int32)[:, -window:]
    remaining = steps
    while remaining > 0:
        chunk = min(remaining, max_len - ctx.shape[1])
        rng, step_rng = jax.random.split(rng)
        dp = DecodeParams(max_len=max_len, steps=chunk, sampling=sampling)
        out = np.asarray(generate(model, params, jnp.asarray(ctx),
                                  step_rng, dp))
        produced.append(out)
        remaining -= chunk
        ctx = np.concatenate([ctx, out], axis=1)[:, -window:]
    return np.concatenate(produced, axis=1)[:, :steps]
