"""Batched mixed-modal serving engine.

The reference serves through a single-request Gradio app (app.py:53-894).
For production TPU serving we run a request queue per task family
(text / mmu / t2i), micro-batch compatible requests, and execute one jitted
program per batch — amortizing the per-step forward across requests and
keeping one compilation per (task, batch-bucket) shape.

Design:
  * fixed batch buckets (1, 2, 4, 8) per task — static shapes for XLA;
  * requests carry their own sampler settings; a batch groups requests with
    identical settings (settings are part of the bucket key since they are
    compile-time constants of the scan);
  * a single dispatcher thread owns the device; worker-side futures deliver
    results. This is the `batched mixed-modal engine` of BASELINE.json
    config 4.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import queue
import threading
import time
from collections import deque
from concurrent.futures import Future, InvalidStateError
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


def _deliver(fut: Future, value) -> None:
    """set_result tolerant of a cancel() racing in after the
    cancelled() check — futures are never marked running, so the client
    can cancel right up to delivery; losing that race must not kill the
    dispatcher thread."""
    if fut.cancelled():
        return
    try:
        fut.set_result(value)
    except InvalidStateError:
        pass


def _fail(fut: Future, exc: Exception) -> None:
    if fut.done():
        return
    try:
        fut.set_exception(exc)
    except InvalidStateError:
        pass

def _buckets_up_to(max_batch: int) -> tuple:
    out, b = [], 1
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("settings",))
def _jit_text(model, prompts, settings, key):
    return model.generate(
        prompts,
        gen_length=settings.gen_length,
        steps=settings.steps,
        block_length=settings.block_length,
        temperature=settings.temperature,
        cfg_scale=settings.cfg_scale,
        remasking=settings.remasking,
        key=key if settings.stochastic else None,
        block_kv_cache=settings.block_kv_cache,
        parallel_threshold=settings.parallel_threshold,
        parallel_warmup_steps=settings.parallel_warmup_steps,
        cache_refresh_every=settings.cache_refresh_every,
    )


@functools.partial(jax.jit, static_argnames=("settings",))
def _jit_text_per_row_keys(model, prompts, settings, keys):
    """Batched stochastic generation with one PRNG key PER ROW: each row's
    noise draws have the same shapes as a solo batch-1 run, so every
    request's result is bit-identical to running it alone with its seed —
    batching composition cannot perturb outputs. This is what makes
    stochastic text requests batchable at all (a single batch key would tie
    a row's sample to its row position)."""

    def row(p, k):
        return model.generate(
            p[None],
            gen_length=settings.gen_length,
            steps=settings.steps,
            block_length=settings.block_length,
            temperature=settings.temperature,
            cfg_scale=settings.cfg_scale,
            remasking=settings.remasking,
            key=k,
            block_kv_cache=settings.block_kv_cache,
            parallel_threshold=settings.parallel_threshold,
            parallel_warmup_steps=settings.parallel_warmup_steps,
            cache_refresh_every=settings.cache_refresh_every,
        )[0]

    return jax.vmap(row, in_axes=(0, 0))(prompts, keys)


@functools.partial(jax.jit, static_argnames=("settings",))
def _jit_t2m(model, frames, attns, settings, key):
    return model.t2m_generate(
        frames,
        attention_mask=attns,
        temperature=settings.temperature,
        timesteps=settings.timesteps,
        num_motion_tokens=settings.num_motion_tokens,
        key=key,
        block_kv_cache=settings.block_kv_cache,
        cache_refresh_every=settings.cache_refresh_every,
    )


@functools.partial(jax.jit, static_argnames=("settings",))
def _jit_t2i(model, frames, unconds, attns, uncond_attns, settings, key):
    return model.t2i_generate(
        frames,
        uncond_input_ids=unconds,
        attention_mask=attns,
        uncond_attention_mask=uncond_attns,
        temperature=settings.temperature,
        timesteps=settings.timesteps,
        guidance_scale=settings.guidance_scale,
        num_vq_tokens=settings.num_vq_tokens,
        key=key,
        block_kv_cache=settings.block_kv_cache,
        cache_refresh_every=settings.cache_refresh_every,
        cfg_interval=settings.cfg_interval,
    )


@dataclasses.dataclass(frozen=True)
class TextSettings:
    gen_length: int = 128
    steps: int = 128
    block_length: int = 128
    temperature: float = 0.0
    cfg_scale: float = 0.0
    remasking: str = "low_confidence"  # or 'random'
    block_kv_cache: bool = False       # approximate cached decode (opt-in)
    parallel_threshold: float = 0.0    # confidence-parallel commits (opt-in)
    parallel_warmup_steps: int = 0     # τ fires only after K steps/block
    cache_refresh_every: int = 0       # cached-mode staleness knob
    # >0: run this request's EXACT sampler as <=N-step device programs and
    # let the dispatcher interleave other work between chunks — a heavy
    # generation stops head-of-line-blocking short requests (and stays
    # under bounded-execution limits). Token-identical to the monolithic
    # program (sampling/text.SegmentedRun).
    segment_steps: int = 0

    @property
    def stochastic(self) -> bool:
        # 'random' remasking draws confidence noise even at temperature 0
        return self.temperature > 0 or self.remasking == "random"


@dataclasses.dataclass(frozen=True)
class T2ISettings:
    timesteps: int = 15
    guidance_scale: float = 3.5
    temperature: float = 1.0
    num_vq_tokens: int = 1024
    block_kv_cache: bool = False       # approximate cached decode (opt-in)
    cache_refresh_every: int = 0       # cached-mode staleness knob
    # >0: run the MaskGIT loop as <=N-timestep device programs so a
    # multi-second t2i request stops blocking text/mmu requests — the
    # dispatcher interleaves other work between windows (exact;
    # sampling/t2i.SegmentedT2IRun)
    segment_timesteps: int = 0
    # guidance interval (lo, hi) step-fractions: CFG only inside the band,
    # single-batch cond-only forwards outside (exact-sampler only —
    # rejected with block_kv_cache; sampling/t2i.MaskGITConfig)
    cfg_interval: tuple = (0.0, 1.0)


@dataclasses.dataclass(frozen=True)
class T2MSettings:
    timesteps: int = 18
    temperature: float = 1.0
    num_motion_tokens: int = 256
    block_kv_cache: bool = False       # approximate cached decode (opt-in)
    cache_refresh_every: int = 0
    segment_timesteps: int = 0         # >0: chunked windows (exact)


@dataclasses.dataclass
class _Request:
    kind: str                      # 'text' | 'mmu' | 't2i'
    payload: Any                   # token array (prompt/frame)
    settings: Any
    future: Future
    seed: int
    enqueue_time: float


class _T2ITask:
    """A chunked t2i generation in flight — the t2i counterpart of
    `_Stream` minus joining (stochastic t2i groups are solo by design:
    one batch key). Duck-typed to the dispatcher's step()/done/fail_all
    protocol so `_step_active` round-robins it with text streams."""

    def __init__(self, run, grp):
        self.run = run            # t2i.SegmentedT2IRun
        self.grp = grp

    @property
    def done(self) -> bool:
        return self.run.done

    def step(self):
        if self.run.step():
            codes = np.asarray(self.run.codes)
            return [(r, codes[i]) for i, r in enumerate(self.grp)]
        return []

    def fail_all(self, exc: Exception):
        for r in self.grp:
            _fail(r.future, exc)
        self.grp = []

    def evict_cancelled(self) -> int:
        """Abort once EVERY awaiting request is cancelled (t2i rows share
        one batch program, so individual rows cannot be dropped)."""
        if self.grp and all(r.future.cancelled() for r in self.grp):
            n = len(self.grp)
            self.grp = []
            self.run.done = True
            return n
        return 0


class _Stream:
    """Continuous batching for chunked exact-sampler requests: one slot
    pool whose rows advance INDEPENDENTLY (per-row `block_ends` in the
    chunk program — models/mmada._segment_block_per_row), so a request
    can join a running batch at any chunk boundary instead of waiting for
    the batch to finish. Each row is a vmapped batch-1 computation with
    its own key schedule, so its tokens are bit-identical to a solo run
    with its seed regardless of what shares the batch (the engine's
    standing per-row-key contract).

    Scheduling shape: steps are consumed in ALIGNED windows of
    `C = min(segment_steps, steps_per_block)` per block; a block whose
    steps_per_block is not a multiple of C gets trailing zero-transfer
    padding steps — exact no-ops, because after the block's real steps no
    masks remain (the transfer schedule sums to the mask count), so
    nothing can commit (k=0 top-k; confidence NEG_INF for the parallel
    threshold). Free slots hold maskless rows for the same reason. Pick
    segment_steps dividing steps/num_blocks to avoid the padding
    forwards.

    The slot pool resizes by power-of-two buckets (one executable per
    bucket size): grows when joins need capacity, shrinks at half
    occupancy so a lone long request stops paying a wide batch.
    """

    def __init__(self, model, kind, settings, prompt_len, bucket,
                 buckets):
        from mmada_tpu.sampling.text import SemiARConfig

        # validate the WHOLE-request shape exactly like the monolithic
        # sampler would (gen/block divisibility, steps per block) — the
        # per-block configs built later never see it, and without this a
        # bad request would silently return truncated output with
        # residual mask tokens
        SemiARConfig(
            gen_length=settings.gen_length, steps=settings.steps,
            block_length=settings.block_length,
            temperature=settings.temperature, cfg_scale=settings.cfg_scale,
            remasking=settings.remasking,
            mask_id=model.vocab.mask_token_id,
            parallel_threshold=settings.parallel_threshold,
            parallel_warmup_steps=settings.parallel_warmup_steps,
        )
        self.key = (kind, settings, prompt_len)
        self.settings = settings
        self.model = model
        self.nb = settings.gen_length // settings.block_length
        self.spb = settings.steps // self.nb
        self.C = min(settings.segment_steps, self.spb)
        self.cpb = -(-self.spb // self.C)      # chunks per block
        self.spb_pad = self.cpb * self.C
        self.P = prompt_len
        self.L = prompt_len + settings.gen_length
        self.buckets = tuple(buckets)  # engine's pow2-ish bucket set
        self._mask_id = model.vocab.mask_token_id
        self._runner = model.segmented_chunk_runner(
            steps_per_block=self.spb, block_length=settings.block_length,
            temperature=settings.temperature, cfg_scale=settings.cfg_scale,
            remasking=settings.remasking,
            parallel_threshold=settings.parallel_threshold,
            parallel_warmup_steps=settings.parallel_warmup_steps,
        )
        self.bucket = 0
        self.slots: list = []
        self.x = None
        self.pi = None
        self._alloc(bucket)

    # ------------------------------------------------------------ slots
    def _alloc(self, bucket):
        """(Re)allocate the slot pool at `bucket`, compacting occupied
        rows to the front. Free rows are maskless (token 0, prompt_index
        True) so their chunk steps are no-ops."""
        keep = [i for i, s in enumerate(self.slots) if s is not None]
        x = jnp.zeros((bucket, self.L), jnp.int32)
        pi = jnp.ones((bucket, self.L), bool)
        if keep:
            idx = jnp.asarray(keep)
            x = x.at[: len(keep)].set(self.x[idx])
            pi = pi.at[: len(keep)].set(self.pi[idx])
        self.x, self.pi = x, pi
        self.slots = [self.slots[i] for i in keep] + [None] * (
            bucket - len(keep)
        )
        self.bucket = bucket

    @property
    def occupancy(self) -> int:
        return sum(s is not None for s in self.slots)

    @property
    def done(self) -> bool:
        return self.occupancy == 0

    def join(self, req: _Request) -> bool:
        """Admit `req` into a free slot (growing to the next engine
        bucket if needed); False when full."""
        if None not in self.slots:
            bigger = [b for b in self.buckets if b > self.bucket]
            if not bigger:
                return False
            self._alloc(bigger[0])
        slot = self.slots.index(None)
        prompt = np.asarray(req.payload, np.int32).reshape(-1)
        row = np.concatenate([
            prompt,
            np.full((self.settings.gen_length,), self._mask_id, np.int32),
        ])
        self.x = self.x.at[slot].set(jnp.asarray(row))
        self.pi = self.pi.at[slot].set(jnp.asarray(row != self._mask_id))
        if self.settings.stochastic:
            from mmada_tpu.sampling.text import _block_key_schedule

            keys = _block_key_schedule(
                jax.random.key(req.seed), self.nb, self.spb
            )  # (nb, spb) typed — identical to the solo run's schedule
            if self.spb_pad > self.spb:
                keys = jnp.concatenate(
                    [keys] + [keys[:, -1:]] * (self.spb_pad - self.spb),
                    axis=1,
                )  # padding keys drive no-op steps only
        else:
            keys = None
        self.slots[slot] = {
            "req": req, "block": 0, "ci": 0, "keys": keys,
            "transfers": None,
        }
        return True

    # ------------------------------------------------------------- step
    def _block_transfers(self, slot: int):
        """Solo-identical per-block schedule, padded to spb_pad."""
        from mmada_tpu.sampling.text import num_transfer_schedule

        st = self.slots[slot]
        bs = self.P + st["block"] * self.settings.block_length
        cnt = (
            self.x[slot, bs:bs + self.settings.block_length]
            == self._mask_id
        ).sum()
        tr = num_transfer_schedule(cnt[None].astype(jnp.int32), self.spb)[0]
        if self.spb_pad > self.spb:
            tr = jnp.concatenate(
                [tr, jnp.zeros((self.spb_pad - self.spb,), tr.dtype)]
            )
        return tr

    def step(self) -> list[tuple[_Request, np.ndarray]]:
        """Run ONE chunk program over the pool; advance row states and
        return the (request, tokens) pairs that completed."""
        ends, keys_rows, tr_rows, offs = [], [], [], []
        zero_tr = jnp.zeros((self.C,), jnp.int32)
        for i in range(self.bucket):
            st = self.slots[i]
            if st is None:
                ends.append(self.settings.block_length)
                tr_rows.append(zero_tr)
                keys_rows.append(None)
                offs.append(0)
                continue
            if st["transfers"] is None:
                st["transfers"] = self._block_transfers(i)
            c0 = st["ci"] * self.C
            ends.append(
                self.P + (st["block"] + 1) * self.settings.block_length
            )
            tr_rows.append(st["transfers"][c0:c0 + self.C])
            keys_rows.append(
                st["keys"][st["block"], c0:c0 + self.C]
                if st["keys"] is not None else None
            )
            offs.append(c0)  # row's first in-block step of this chunk
        if self.settings.stochastic:
            # idle rows reuse any real row's keys — their zero transfers
            # make the steps no-ops whatever the noise draws
            proto = next(k for k in keys_rows if k is not None)
            step_keys = jnp.stack(
                [k if k is not None else proto for k in keys_rows]
            )
        else:
            step_keys = jnp.zeros((self.bucket, self.C, 2), jnp.uint32)
        self.x = self._runner(
            self.x, self.pi, jnp.asarray(ends, jnp.int32), step_keys,
            jnp.stack(tr_rows), jnp.asarray(offs, jnp.int32),
        )
        finished = []
        for i in range(self.bucket):
            st = self.slots[i]
            if st is None:
                continue
            st["ci"] += 1
            if st["ci"] == self.cpb:
                st["ci"] = 0
                st["block"] += 1
                st["transfers"] = None
                if st["block"] == self.nb:
                    finished.append(i)
        if finished:
            xs = np.asarray(self.x)
            out = [(self.slots[i]["req"], xs[i]) for i in finished]
            for i in finished:
                self.slots[i] = None
        else:
            out = []
        # shrink: a lone survivor should not pay a wide batch
        occ = self.occupancy
        if occ:
            fit = next(b for b in self.buckets if b >= occ)
            if fit <= self.bucket // 2:
                self._alloc(fit)
        return out

    def fail_all(self, exc: Exception):
        for s in self.slots:
            if s is not None:
                _fail(s["req"].future, exc)
        self.slots = [None] * self.bucket

    def evict_cancelled(self) -> int:
        """Free slots whose request was cancelled — the device stops
        paying for them at the NEXT chunk boundary. The freed row is
        cleared to the maskless free-slot state (a cancelled row's
        leftover masks could otherwise commit via parallel_threshold)."""
        n = 0
        for i, s in enumerate(self.slots):
            if s is not None and s["req"].future.cancelled():
                self.slots[i] = None
                self.x = self.x.at[i].set(0)
                self.pi = self.pi.at[i].set(True)
                n += 1
        return n





class ServingEngine:
    def __init__(
        self,
        model,
        max_batch: int = 8,
        max_wait_ms: float = 10.0,
        max_queue: int = 256,
        min_chunk_device_ms: float = 25.0,
    ):
        self.model = model
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        # chunked-scheduling auto-guard: honoring segment_steps is a pure
        # loss when a chunk's device work is smaller than the per-chunk
        # dispatch overhead (~25 ms measured on the 165M proxy,
        # SERVING_r03.json: chunking made every op point 1.6-6x WORSE
        # there, while the 8B heavy op won 12.4x on short-request p50).
        # Requests whose estimated per-chunk device time is below this
        # floor run monolithic instead. 0 disables the guard (always
        # honor segment_steps).
        self.min_chunk_device_s = min_chunk_device_ms / 1000.0
        self._chunk_guard_logged: set = set()
        self.buckets = _buckets_up_to(max_batch)
        # bounded queue: submit raises queue.Full under overload instead of
        # accumulating unbounded request memory
        self._queue: "queue.Queue[_Request]" = queue.Queue(maxsize=max_queue)
        # continuous-batching streams in flight, round-robined one chunk
        # at a time (dispatcher thread only — no lock needed)
        self._active: deque[_Stream] = deque()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._stats_lock = threading.Lock()
        self.stats = {"requests": 0, "batches": 0, "batched_requests": 0,
                      "chunks": 0, "stream_joins": 0, "cancelled": 0,
                      "chunk_guard_skips": 0}
        self._draining = False
        # dispatcher-owned: True only when no stream is in flight AND the
        # queue was empty at the end of a loop iteration (drain waits on
        # this — sampling _active from another thread races with the
        # popleft/step/append cycle)
        self._quiescent = True
        # rolling completion latencies per kind (last 256), for /stats
        self._latencies: dict = {}

    # ------------------------------------------------------------ public
    def start(self):
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self, drain: bool = False, drain_timeout_s: float = 300.0):
        """`drain=True` (rolling-restart mode): reject new submissions,
        FINISH queued and in-flight work (chunked streams keep stepping),
        then stop — no accepted request is failed unless the drain
        timeout expires. Default: fail everything still pending."""
        if drain:
            self._draining = True   # submit() starts rejecting
            deadline = time.time() + drain_timeout_s
            while (not self._quiescent and time.time() < deadline
                   and self._thread and self._thread.is_alive()):
                time.sleep(0.01)
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
        # resolve anything still queued so no caller hangs on result()
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            _fail(req.future, RuntimeError("engine stopped"))

    def submit_text(self, prompt_ids: np.ndarray, settings: TextSettings,
                    seed: int = 0) -> Future:
        return self._submit("text", prompt_ids, settings, seed)

    def submit_mmu(self, frame_ids: np.ndarray, settings: TextSettings,
                   seed: int = 0) -> Future:
        return self._submit("mmu", frame_ids, settings, seed)

    def submit_t2m(self, frame_ids: np.ndarray, settings: T2MSettings,
                   seed: int = 0,
                   attention_mask: Optional[np.ndarray] = None) -> Future:
        return self._submit("t2m", (frame_ids, attention_mask), settings,
                            seed)

    def submit_t2i(self, frame: np.ndarray, uncond: np.ndarray,
                   settings: T2ISettings, seed: int = 0,
                   attention_mask: Optional[np.ndarray] = None,
                   uncond_attention_mask: Optional[np.ndarray] = None) -> Future:
        return self._submit(
            "t2i", (frame, uncond, attention_mask, uncond_attention_mask),
            settings, seed,
        )

    def _submit(self, kind, payload, settings, seed) -> Future:
        fut: Future = Future()
        if self._draining or self._stop.is_set():
            fut.set_exception(RuntimeError("engine draining"))
            return fut
        try:
            self._queue.put_nowait(
                _Request(kind, payload, settings, fut, seed, time.time())
            )
        except queue.Full:
            fut.set_exception(
                RuntimeError("serving queue full — backpressure")
            )
            return fut
        self._bump("requests")
        return fut

    def _record_latency(self, req: _Request):
        with self._stats_lock:
            dq = self._latencies.setdefault(req.kind, deque(maxlen=256))
            dq.append(time.time() - req.enqueue_time)

    def latency_stats(self) -> dict:
        """Rolling per-kind completion latency (seconds since enqueue):
        count / p50 / p95 over the last 256 requests of each kind."""
        out = {}
        with self._stats_lock:
            items = {k: sorted(v) for k, v in self._latencies.items()}
        for kind, xs in items.items():
            out[kind] = {
                "count": len(xs),
                "p50_s": round(xs[len(xs) // 2], 4),
                "p95_s": round(xs[min(len(xs) - 1, int(len(xs) * 0.95))], 4),
            }
        return out

    def _bump(self, name: str, n: int = 1):
        # read-modify-write on the counters happens from HTTP worker
        # threads (submit) AND the dispatcher thread (_run_group)
        with self._stats_lock:
            self.stats[name] += n

    # --------------------------------------------------------- dispatcher
    def _loop(self):
        while not self._stop.is_set():
            # with chunked work in flight, poll the queue without sleeping
            # so the device never idles between chunks
            pending = self._collect(block=not self._active)
            if pending:
                self._flush(pending)
            if self._active:
                self._step_active()
            self._quiescent = not self._active and self._queue.empty()
        if not self._active:  # final drain only if nothing will hang
            pending = self._collect(block=False)
            if pending:
                self._flush(pending)
        while self._active:
            self._active.popleft().fail_all(RuntimeError("engine stopped"))

    def _collect(self, block: bool) -> list[_Request]:
        pending: list[_Request] = []
        try:
            pending.append(self._queue.get(timeout=0.05 if block else 0.0))
        except queue.Empty:
            return pending
        # group-compatible requests arriving within the batching window
        deadline = pending[0].enqueue_time + self.max_wait
        while len(pending) < self.max_batch and time.time() < deadline:
            try:
                pending.append(
                    self._queue.get(timeout=max(0.0, deadline - time.time()))
                )
            except queue.Empty:
                break
        return pending

    def _step_active(self):
        """Advance the oldest in-flight stream by ONE bounded device
        program; re-queue it unless drained. Round-robin at chunk
        granularity is what keeps short requests from waiting out a heavy
        generation's full duration."""
        stream = self._active.popleft()
        evicted = stream.evict_cancelled()
        if evicted:
            self._bump("cancelled", evicted)
        if stream.done:
            return
        try:
            finished = stream.step()
            self._bump("chunks")
        except Exception as e:  # pragma: no cover
            logger.exception("chunk failed")
            stream.fail_all(e)
            return
        for req, tokens in finished:
            self._record_latency(req)
            _deliver(req.future, tokens)
        if not stream.done:
            self._active.append(stream)

    def _flush(self, requests: list[_Request]):
        # drop requests cancelled while queued (futures are never marked
        # running, so Future.cancel() works until delivery)
        live = [r for r in requests if not r.future.cancelled()]
        if len(live) != len(requests):
            self._bump("cancelled", len(requests) - len(live))
        requests = live
        if not requests:
            return
        # group by (kind, settings, payload length). Stochastic text/mmu
        # batches use one PRNG key PER ROW (_jit_text_per_row_keys), so each
        # request reproduces its solo run bit-exactly regardless of batch
        # composition — text batching is the big serving win (2.2x aggregate
        # at batch 8, BASELINE.md). t2i stays UNBATCHED: its sampler takes
        # one batch key and samples categorically at every temperature, and
        # t2i throughput is flat across batch sizes anyway (compute-bound
        # from batch 1), so batching would only break seed reproducibility
        # for zero gain.
        groups: dict[tuple, list[_Request]] = {}
        for r in requests:
            if r.kind == "t2m":
                length = (r.payload[0].shape[-1], r.payload[1] is not None)
                solo = id(r)   # categorical sampling: same solo rule as t2i
            elif r.kind == "t2i":
                # both frame AND uncond lengths shape the program, as does
                # mask presence (None vs array changes the jit signature)
                length = (
                    r.payload[0].shape[-1], r.payload[1].shape[-1],
                    r.payload[2] is not None, r.payload[3] is not None,
                )
                # t2i token sampling is categorical at ANY temperature
                # (temperature only gates re-mask noise), so batching
                # would share one key across seeds — every t2i request
                # runs solo to keep per-seed reproducibility; throughput
                # is flat across batch sizes anyway (compute-bound)
                solo = id(r)
            else:
                length = r.payload.shape[-1]
                solo = None
            groups.setdefault(
                (r.kind, r.settings, length, solo), []
            ).append(r)
        for (kind, settings, _, _), grp in groups.items():
            try:
                self._run_group(kind, settings, grp)
            except Exception as e:  # pragma: no cover
                logger.exception("batch failed")
                for r in grp:
                    _fail(r.future, e)

    def _run_group(self, kind: str, settings, grp: list[_Request]):
        n = len(grp)

        if kind in ("text", "mmu") and settings.segment_steps > 0:
            # chunked: admit into a continuous-batching stream instead of
            # running one monolithic program — the dispatcher round-robins
            # streams one chunk at a time (_step_active), and later
            # same-key requests JOIN a running stream at a chunk boundary
            # (per-row block progress makes the mixed batch exact).
            if settings.block_kv_cache:
                raise ValueError(
                    "segment_steps is exact-sampler only — unset "
                    "block_kv_cache"
                )
            prompt_len = int(np.asarray(grp[0].payload).reshape(-1).shape[0])
            # the chunk program runs the whole joined group, so price all
            # rows that will share it (ADVICE r4: one-row pricing demoted
            # full batches of near-floor requests to monolithic)
            est = self._est_chunk_device_s(settings, prompt_len) * min(
                n, self.max_batch)
            if 0 < est < self.min_chunk_device_s:
                # auto-guard: the op is too small for chunking to pay —
                # run it monolithic (policy was README prose until r4)
                gk = (kind, settings)
                if gk not in self._chunk_guard_logged:
                    self._chunk_guard_logged.add(gk)
                    logger.info(
                        "segment_steps=%d ignored for %s op (est. chunk "
                        "device time %.1f ms < %.0f ms floor): running "
                        "monolithic", settings.segment_steps, kind,
                        est * 1e3, self.min_chunk_device_s * 1e3,
                    )
                self._bump("chunk_guard_skips")
            else:
                self._admit_chunked(kind, settings, grp, prompt_len)
                return

        bucket = next(b for b in self.buckets if n <= b)
        self._bump("batches")
        self._bump("batched_requests", n)
        key = jax.random.key(grp[0].seed)
        self._run_monolithic(kind, settings, grp, n, bucket, key)

    def _est_chunk_device_s(self, settings, prompt_len: int) -> float:
        """Estimated device seconds of ONE chunk of this request at a
        deliberately conservative achieved rate (50 TFLOP/s — well under
        any TPU's real rate, so the estimate overstates chunk time and
        errs toward KEEPING the fairness lever). Uses the model config's
        matmul FLOPs; returns 0.0 when the model exposes no config (duck
        -typed test doubles), which disables the guard for that model."""
        cfg = getattr(self.model, "cfg", None)
        if cfg is None or settings.block_length <= 0:
            return 0.0
        from mmada_tpu.utils.flops import forward_matmul_flops_per_token

        L = prompt_len + settings.gen_length
        nb = max(settings.gen_length // settings.block_length, 1)
        spb = max(settings.steps // nb, 1)
        c = min(settings.segment_steps, spb)
        rows = 2 if settings.cfg_scale > 0 else 1
        flops_per_step = rows * L * forward_matmul_flops_per_token(
            cfg, L, settings.block_length,
            getattr(cfg, "embedding_size", None) or cfg.vocab_size,
        )
        return c * flops_per_step / 50e12

    def _admit_chunked(self, kind, settings, grp, prompt_len):
        skey = (kind, settings, prompt_len)
        reqs = list(grp)
        for stream in self._active:
            if stream.key != skey:
                continue
            while reqs and stream.join(reqs[0]):
                reqs.pop(0)
                self._bump("stream_joins")
        while reqs:
            take, reqs = reqs[:self.max_batch], reqs[self.max_batch:]
            b0 = next(b for b in self.buckets if len(take) <= b)
            stream = _Stream(
                self.model, kind, settings, prompt_len, b0,
                self.buckets,
            )
            for r in take:
                stream.join(r)
            self._active.append(stream)

    def _run_monolithic(self, kind, settings, grp, n, bucket, key):
        if kind in ("text", "mmu"):
            prompts = np.stack([np.asarray(r.payload).reshape(-1) for r in grp])
            seeds = [r.seed for r in grp]
            if bucket > n:  # pad batch to the bucket with copies
                prompts = np.concatenate(
                    [prompts, np.repeat(prompts[-1:], bucket - n, 0)]
                )
                seeds += [seeds[-1]] * (bucket - n)
            if settings.stochastic:
                keys = jax.vmap(jax.random.key)(jnp.asarray(seeds, jnp.uint32))
                out = np.asarray(
                    _jit_text_per_row_keys(
                        self.model, jnp.asarray(prompts), settings, keys
                    )
                )
            else:
                out = np.asarray(
                    _jit_text(self.model, jnp.asarray(prompts), settings, key)
                )
            for i, r in enumerate(grp):
                self._record_latency(r)
                _deliver(r.future, out[i])
        elif kind == "t2m":
            frame = jnp.asarray(
                np.asarray(grp[0].payload[0], np.int64).reshape(1, -1)
            )
            attn = (jnp.asarray(
                        np.asarray(grp[0].payload[1]).reshape(1, -1))
                    if grp[0].payload[1] is not None else None)
            if settings.segment_timesteps > 0:
                if settings.block_kv_cache:
                    raise ValueError(
                        "segment_timesteps is exact-sampler only — "
                        "unset block_kv_cache"
                    )
                run = self.model.t2m_segmented_run(
                    frame, attention_mask=attn,
                    temperature=settings.temperature,
                    timesteps=settings.timesteps,
                    num_motion_tokens=settings.num_motion_tokens,
                    key=key,
                    segment_timesteps=settings.segment_timesteps,
                )
                self._active.append(_T2ITask(run, grp))
                return
            codes = np.asarray(
                _jit_t2m(self.model, frame, attn, settings, key)
            )
            for i, r in enumerate(grp):
                self._record_latency(r)
                _deliver(r.future, codes[i])
        elif kind == "t2i":
            def stack(idx):
                rows = [r.payload[idx] for r in grp]
                if rows[0] is None:
                    return None
                arr = np.stack([np.asarray(x).reshape(-1) for x in rows])
                if bucket > n:
                    arr = np.concatenate([arr, np.repeat(arr[-1:], bucket - n, 0)])
                return jnp.asarray(arr)

            if settings.segment_timesteps > 0:
                # chunked t2i: the dispatcher interleaves other work
                # between <=N-timestep windows instead of owning the
                # device for the full MaskGIT loop. No mid-flight
                # joining (t2i groups are usually solo: stochastic
                # sampling shares one batch key) — _T2ITask just
                # iterates windows.
                if settings.block_kv_cache:
                    raise ValueError(
                        "segment_timesteps is exact-sampler only — "
                        "unset block_kv_cache"
                    )
                run = self.model.t2i_segmented_run(
                    stack(0), uncond_input_ids=stack(1),
                    attention_mask=stack(2),
                    uncond_attention_mask=stack(3),
                    temperature=settings.temperature,
                    timesteps=settings.timesteps,
                    guidance_scale=settings.guidance_scale,
                    num_vq_tokens=settings.num_vq_tokens,
                    key=key,
                    segment_timesteps=settings.segment_timesteps,
                    cfg_interval=settings.cfg_interval,
                )
                self._active.append(_T2ITask(run, grp))
                return
            codes = np.asarray(
                _jit_t2i(
                    self.model, stack(0), stack(1), stack(2), stack(3),
                    settings, key,
                )
            )
            for i, r in enumerate(grp):
                _deliver(r.future, codes[i])
        else:
            raise ValueError(kind)
