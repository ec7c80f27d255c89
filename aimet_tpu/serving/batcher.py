"""Continuous batching over fixed decode slots.

No reference counterpart (serving-side design from BASELINE config 5): a
fixed pool of B cache slots; new requests prefill into a free slot; every
engine step decodes all active slots in one batched jitted call with
per-slot cache positions; finished requests free their slots immediately so
new work is admitted without draining the batch.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import tree_util as jtu

from .quantized_llm import QuantizedLLM, quantized_forward


@dataclasses.dataclass
class Request:
    uid: int
    prompt: List[int]
    max_new_tokens: int
    eos_id: Optional[int] = None
    generated: List[int] = dataclasses.field(default_factory=list)
    done: bool = False


class ContinuousBatcher:
    """``use_native=True`` (default) runs the admission/slot/termination
    state machine in the C++ runtime (native/src/scheduler.cpp); the pure-
    Python path below is the fallback and the behavioral reference."""

    def __init__(self, llm: QuantizedLLM, num_slots: int = 4,
                 use_native: bool = True, step_chunk: int = 1):
        """``step_chunk``: decode this many tokens per engine step inside
        ONE jitted lax.scan before syncing to the host (multi-step
        scheduling). With a high host<->device latency (the axon relay
        here costs ~200 ms per fetch), per-token host sync dominates; a
        chunk amortizes it K-fold. Admission and slot-freeing happen at
        chunk boundaries; a request finishing mid-chunk wastes at most
        K-1 slot-steps (its tail tokens are discarded, the stale cache
        rows are masked out by the per-slot position on reuse)."""
        self.llm = llm
        self.num_slots = num_slots
        self.step_chunk = max(1, int(step_chunk))
        self.caches = llm.new_caches(num_slots)
        self.positions = np.zeros(num_slots, np.int32)
        self.next_token = np.zeros(num_slots, np.int32)
        self.slot_req: List[Optional[Request]] = [None] * num_slots
        self._uid = 0
        self.pending: List[Request] = []
        self._chunk_fn = None
        self._admit_fn = None
        self._admit_carry_fn = None
        self._chunk_carry_fn = None
        # slots admitted by the pipelined engine whose registration is
        # deferred to the chunk drain — they must not look free meanwhile
        self._reserved = set()
        self._sched = None
        if use_native:
            from .. import native
            if native.available():
                self._sched = native.NativeScheduler(num_slots, llm.max_len)
                self._by_uid: Dict[int, Request] = {}

    # -- API ---------------------------------------------------------------
    def submit(self, prompt: List[int], max_new_tokens: int = 16,
               eos_id: Optional[int] = None) -> Request:
        if self._sched is not None:
            uid = self._sched.submit(len(prompt), max_new_tokens, eos_id)
            req = Request(uid, list(prompt), max_new_tokens, eos_id)
            self._by_uid[uid] = req
            return req
        req = Request(self._uid, list(prompt), max_new_tokens, eos_id)
        self._uid += 1
        self.pending.append(req)
        return req

    @property
    def num_active(self) -> int:
        if self._sched is not None:
            return self._sched.num_active
        return sum(r is not None for r in self.slot_req)

    def _free_slots(self):
        return [i for i, r in enumerate(self.slot_req)
                if r is None and i not in self._reserved]

    # -- internals -----------------------------------------------------------
    def _prefill_into_slot(self, slot: int, req: Request):
        tok = self._prefill_llm(req, slot)
        req.generated.append(tok)
        self.slot_req[slot] = req
        self.positions[slot] = len(req.prompt)
        self.next_token[slot] = tok
        self._maybe_finish(slot)

    def _maybe_finish(self, slot: int):
        req = self.slot_req[slot]
        if req is None:
            return
        if (len(req.generated) >= req.max_new_tokens
                or (req.eos_id is not None and req.generated
                    and req.generated[-1] == req.eos_id)
                or int(self.positions[slot]) >= self.llm.max_len - 1):
            req.done = True
            self.slot_req[slot] = None

    def _prefill_llm(self, req: Request, slot: int) -> int:
        """Run the jitted prefill for one request, write its cache row into
        ``slot``; returns the first generated token."""
        return self._prefill_batch([slot], [req])[0]

    @staticmethod
    def _wave_quota(n: int) -> int:
        """Largest power of two <= n: admission waves come in AT MOST
        log2(num_slots)+1 distinct batch shapes, so the (expensive, at 8B
        ~tens of seconds even kernel-cache-warm) whole-graph prefill
        compiles a bounded set of programs. Unrestricted wave sizes
        compiled a fresh 8B prefill for nearly every admission — the
        first driver capture ran at 25 tok/s, ~100x below the decode
        rate, almost entirely compile time."""
        p = 1
        while p * 2 <= n:
            p *= 2
        return p

    def _prefill_batch(self, slots: List[int], reqs: List[Request]
                       ) -> List[int]:
        """Admit a WAVE of requests with one batched prefill call: prompts
        are right-padded to the wave's max length rounded up to a
        multiple of 32 (the per-slot position masks out padding rows, and
        rows past each prompt's length are overwritten by decode appends
        before they can be attended), cache rows written per slot. One
        device round-trip per wave instead of one per request — through a
        high-latency link (axon relay: ~200 ms/fetch) per-request
        admission would dominate the whole engine. Wave sizes and padded
        lengths are bucketed so the set of compiled prefill shapes stays
        small."""
        llm = self.llm
        real_max = max(len(r.prompt) for r in reqs)
        maxlen = -(-real_max // 32) * 32
        if maxlen > llm.max_len - 1:     # rounding must not exceed the cache
            maxlen = real_max
        toks = np.zeros((len(reqs), maxlen), np.int32)
        for i, r in enumerate(reqs):
            toks[i, :len(r.prompt)] = r.prompt
        lengths = jnp.asarray([len(r.prompt) for r in reqs], jnp.int32)
        rows = jnp.asarray(slots, jnp.int32)
        first, self.caches = self._admit(jnp.asarray(toks), lengths, rows,
                                         self.caches)
        return [int(t) for t in np.asarray(first)]

    def _admit(self, toks, lengths, rows, caches):
        """ONE jitted dispatch for the whole admission wave: wave-cache
        init + prefill + first-token argmax + scatter into the slot
        caches. Done piecewise, the ~2*n_layers eager scatter ops each
        paid a host<->device round-trip (axon relay ~200 ms): a 32-layer
        admission cost ~6 s of pure dispatch latency (probed small-scale,
        5.5 s/wave at 4 layers is the same effect). The wave caches are
        donated so the scatter updates the slot caches in place."""
        if self._admit_fn is None:
            llm = self.llm

            def admit(qw, toks, lengths, rows, caches):
                from ..ops.kv_cache import init_quantized_kv_cache
                n = toks.shape[0]
                kc = [init_quantized_kv_cache(
                    n, llm.max_len, llm.cfg.n_kv_heads, llm.cfg.head_dim)
                    for _ in range(llm.cfg.n_layers)]
                logits, kc = quantized_forward(
                    qw, llm.cfg, toks, kc, 0, prefill=True, mode=llm.mode,
                    prompt_lengths=lengths)
                first = jnp.argmax(
                    logits[jnp.arange(n), lengths - 1], axis=-1
                ).astype(jnp.int32)
                new = [jtu.tree_map(lambda full, k: full.at[rows].set(k),
                                    c, kci)
                       for c, kci in zip(caches, kc)]
                return first, new
            self._admit_fn = jax.jit(admit, static_argnames=(),
                                     donate_argnums=(4,))
        return self._admit_fn(self.llm.qw, toks, lengths, rows, caches)

    def warm_admission(self, wave_sizes=(1, 2, 4, 8, 16),
                       prompt_len: int = 32, pipelined: bool = False):
        """Precompile the admission-wave shapes (power-of-two buckets,
        see _wave_quota) outside any latency-sensitive region — with
        ``pipelined=True`` the run_pipelined variants (_admit_carry +
        _chunk_carry) instead of the step-mode ones. Writes dummy rows
        into slot 0's cache — safe before real traffic: the slot is
        free, so the rows are never attended, and the first real
        admission overwrites them."""
        wl = min(-(-prompt_len // 32) * 32, self.llm.max_len - 1)
        for n in wave_sizes:
            if n > self.num_slots:
                continue
            if pipelined:
                tok = jnp.asarray(self.next_token[:, None], jnp.int32)
                pos = jnp.asarray(self.positions, jnp.int32)
                first, self.caches, _, _ = self._admit_carry(
                    jnp.zeros((n, wl), jnp.int32),
                    jnp.full((n,), min(prompt_len, wl), jnp.int32),
                    jnp.zeros((n,), jnp.int32), self.caches, tok, pos)
            else:
                first, self.caches = self._admit(
                    jnp.zeros((n, wl), jnp.int32),
                    jnp.full((n,), min(prompt_len, wl), jnp.int32),
                    jnp.zeros((n,), jnp.int32), self.caches)
            np.asarray(first[0:1])
        if pipelined:
            # one chunk on the carry variant (garbage rows into free
            # slots at position 0 — rewritten by the first admission)
            tok = jnp.asarray(self.next_token[:, None], jnp.int32)
            pos = jnp.asarray(self.positions, jnp.int32)
            toks, _, self.caches, _ = self._chunk_carry(tok, self.caches,
                                                        pos)
            np.asarray(toks[0:1, 0:1])

    def _decode_tokens(self):
        """One device round-trip: K = step_chunk decode steps in one jit.
        Returns (K, num_slots) generated tokens in chronological order."""
        tokens = jnp.asarray(self.next_token[:, None], jnp.int32)
        idx = jnp.asarray(self.positions, jnp.int32)
        if self.step_chunk == 1:
            logits, self.caches = self.llm._decode(
                self.llm.qw, self.llm.cfg, tokens, self.caches, idx)
            return np.asarray(jnp.argmax(logits[:, -1], axis=-1),
                              np.int32)[None, :]
        if self._chunk_fn is None:
            llm = self.llm
            from functools import partial

            def run(qw, tok, caches, pos):
                def body(carry, _):
                    tok, caches, pos = carry
                    logits, caches = quantized_forward(
                        qw, llm.cfg, tok, caches, pos, prefill=False,
                        mode=llm.mode)
                    nxt = jnp.argmax(logits[:, -1], -1)[:, None] \
                        .astype(jnp.int32)
                    return (nxt, caches, pos + 1), nxt[:, 0]
                (_, caches, _), toks = jax.lax.scan(
                    body, (tok, caches, pos), None, length=self.step_chunk)
                return toks, caches
            self._chunk_fn = jax.jit(run)
        toks, self.caches = self._chunk_fn(self.llm.qw, tokens,
                                           self.caches, idx)
        return np.asarray(toks, np.int32)          # (K, num_slots)

    # -- pipelined engine ----------------------------------------------------
    def _admit_carry(self, toks, lengths, rows, caches, tok_c, pos_c):
        """_admit plus the device-side decode carry update: the admitted
        slots' next-token and position vectors are set ON DEVICE so the
        next chunk can be dispatched without any host round-trip."""
        if self._admit_carry_fn is None:
            llm = self.llm

            def admit(qw, toks, lengths, rows, caches, tok_c, pos_c):
                from ..ops.kv_cache import init_quantized_kv_cache
                n = toks.shape[0]
                kc = [init_quantized_kv_cache(
                    n, llm.max_len, llm.cfg.n_kv_heads, llm.cfg.head_dim)
                    for _ in range(llm.cfg.n_layers)]
                logits, kc = quantized_forward(
                    qw, llm.cfg, toks, kc, 0, prefill=True, mode=llm.mode,
                    prompt_lengths=lengths)
                first = jnp.argmax(
                    logits[jnp.arange(n), lengths - 1], axis=-1
                ).astype(jnp.int32)
                new = [jtu.tree_map(lambda full, k: full.at[rows].set(k),
                                    c, kci)
                       for c, kci in zip(caches, kc)]
                tok_c = tok_c.at[rows, 0].set(first)
                pos_c = pos_c.at[rows].set(lengths)
                return first, new, tok_c, pos_c
            self._admit_carry_fn = jax.jit(admit, donate_argnums=(4, 5, 6))
        return self._admit_carry_fn(self.llm.qw, toks, lengths, rows,
                                    caches, tok_c, pos_c)

    def _chunk_carry(self, tok, caches, pos):
        """step_chunk decode steps on a DEVICE-side carry; returns
        (toks (K, B), tok', caches', pos') without any host sync."""
        if self._chunk_carry_fn is None:
            llm = self.llm

            def run(qw, tok, caches, pos):
                def body(carry, _):
                    tok, caches, pos = carry
                    logits, caches = quantized_forward(
                        qw, llm.cfg, tok, caches, pos, prefill=False,
                        mode=llm.mode)
                    nxt = jnp.argmax(logits[:, -1], -1)[:, None] \
                        .astype(jnp.int32)
                    return (nxt, caches, pos + 1), nxt[:, 0]
                (tok, caches, pos), toks = jax.lax.scan(
                    body, (tok, caches, pos), None, length=self.step_chunk)
                return toks, tok, caches, pos
            self._chunk_carry_fn = jax.jit(run, donate_argnums=(1, 2, 3))
        return self._chunk_carry_fn(self.llm.qw, tok, caches, pos)

    def _register_first(self, slot: int, req: Request, tok: int):
        self._reserved.discard(slot)
        req.generated.append(tok)
        self.slot_req[slot] = req
        self.positions[slot] = len(req.prompt)
        if self._sched is not None:
            if self._sched.start(slot, tok):
                self._finish_native(slot, req)
        else:
            self._maybe_finish(slot)

    def _assemble_wave(self):
        if self._sched is not None:
            sched = self._sched
            free = self.num_slots - sched.num_active
            quota = self._wave_quota(min(free, sched.num_pending)) \
                if free and sched.num_pending else 0
            wave = []
            for _ in range(quota):
                slot, uid = sched.admit()
                if slot < 0:
                    break
                wave.append((slot, self._by_uid[uid]))
            return wave
        free = self._free_slots()
        quota = self._wave_quota(min(len(free), len(self.pending))) \
            if free and self.pending else 0
        wave = [(slot, self.pending.pop(0)) for slot in free[:quota]]
        self._reserved.update(s for s, _ in wave)
        return wave

    def _record_cb(self):
        if self._sched is not None:
            def record(slot, t):
                if self._sched.record(slot, t):
                    self._finish_native(slot, self.slot_req[slot])
                    return True
                return False
        else:
            def record(slot, t):
                self._maybe_finish(slot)
                return self.slot_req[slot] is None
        return record

    def _has_work(self) -> bool:
        if self._sched is not None:
            return bool(self._sched.num_pending or self._sched.num_active)
        return bool(self.pending or self.num_active or self._reserved)

    def run_pipelined(self, max_steps: int = 10_000) -> int:
        """Drain all requests with the decode chain kept ON DEVICE and
        each chunk's token fetch overlapped with the NEXT chunk's
        compute: dispatch chunk n+1 (and any admission prefill) from the
        device-side carry BEFORE fetching chunk n's tokens, so the
        host<->device round-trip (axon relay: ~200 ms per fetch — about
        2x a 16-token 8B chunk's device time) hides behind real work.

        The price is one chunk of scheduling latency: admissions see
        slot-free information that is one chunk stale, and a freed slot
        keeps decoding discarded tokens for one extra chunk (the stale
        rows are masked by the per-slot position on reuse — the same
        invariant the chunked engine already relies on mid-chunk).
        Tokens per REQUEST are identical to the per-step engine: each
        request's greedy chain depends only on its own prompt and cache
        rows. Returns the number of chunk steps dispatched."""
        record = self._record_cb()
        tok = jnp.asarray(self.next_token[:, None], jnp.int32)
        pos = jnp.asarray(self.positions, jnp.int32)
        caches = self.caches
        inflight = None          # (toks_dev, wave, first_dev, active)
        steps = 0
        while steps < max_steps:
            if inflight is None and not self._has_work():
                break
            wave = self._assemble_wave()
            first = None
            if wave:
                reqs = [r for _, r in wave]
                real_max = max(len(r.prompt) for r in reqs)
                maxlen = -(-real_max // 32) * 32
                if maxlen > self.llm.max_len - 1:
                    maxlen = real_max
                wtoks = np.zeros((len(reqs), maxlen), np.int32)
                for i, r in enumerate(reqs):
                    wtoks[i, :len(r.prompt)] = r.prompt
                lengths = jnp.asarray([len(r.prompt) for r in reqs],
                                      jnp.int32)
                rows = jnp.asarray([s for s, _ in wave], jnp.int32)
                first, caches, tok, pos = self._admit_carry(
                    jnp.asarray(wtoks), lengths, rows, caches, tok, pos)
            active = ([i for i, r in enumerate(self.slot_req)
                       if r is not None]
                      if self._sched is None else
                      list(self._sched.active_slots()))
            if not active and not wave:
                # nothing decodable this round: settle the in-flight
                # chunk (its terminations may free work) and re-check
                if inflight is not None:
                    self._drain(inflight, record)
                    inflight = None
                    continue
                break
            toks_dev, tok, caches, pos = self._chunk_carry(tok, caches, pos)
            steps += 1
            if inflight is not None:
                self._drain(inflight, record)
            inflight = (toks_dev, wave, first, active)
        if inflight is not None:
            self._drain(inflight, record)
        self.caches = caches
        return steps

    def _drain(self, inflight, record):
        toks_dev, wave, first_dev, active = inflight
        if wave:
            toks, firsts = jax.device_get((toks_dev, first_dev))
            for (slot, req), t in zip(wave, firsts):
                self._register_first(slot, req, int(t))
        else:
            toks = np.asarray(toks_dev)
        # tokens for slots admitted THIS chunk are real (the carry held
        # their first token when the chunk was dispatched); slots freed
        # while this chunk was in flight decoded discarded garbage and
        # must not be recorded (slot_req is None for them by now)
        act = sorted(s for s in set(active) | {s for s, _ in wave}
                     if self.slot_req[s] is not None)
        self._consume(np.asarray(toks, np.int32), act, self.positions,
                      record)

    def _consume(self, toks, active, positions_np, record):
        """Apply a chunk of generated tokens in chronological order;
        ``record(slot, tok) -> finished`` owns the termination rule."""
        alive = set(active)
        for krow in toks:
            if not alive:
                break
            for slot in list(alive):
                req = self.slot_req[slot]
                t = int(krow[slot])
                req.generated.append(t)
                positions_np[slot] += 1
                self.next_token[slot] = t
                if record(slot, t):
                    alive.discard(slot)

    # -- engine step ---------------------------------------------------------
    def step(self):
        """Admit pending requests into free slots, then decode
        ``step_chunk`` tokens for every active slot in one device
        round-trip."""
        if self._sched is not None:
            return self._step_native()
        free = self._free_slots()
        quota = self._wave_quota(min(len(free), len(self.pending))) \
            if free and self.pending else 0
        wave = []
        for slot in free[:quota]:
            wave.append((slot, self.pending.pop(0)))
        if wave:
            firsts = self._prefill_batch([s for s, _ in wave],
                                         [r for _, r in wave])
            for (slot, req), tok in zip(wave, firsts):
                req.generated.append(tok)
                self.slot_req[slot] = req
                self.positions[slot] = len(req.prompt)
                self.next_token[slot] = tok
                self._maybe_finish(slot)

        active = [i for i, r in enumerate(self.slot_req) if r is not None]
        if not active:
            return False

        toks = self._decode_tokens()

        def record(slot, t):
            self._maybe_finish(slot)
            return self.slot_req[slot] is None
        self._consume(toks, active, self.positions, record)
        return True

    def _step_native(self):
        sched = self._sched
        # admit at most the number of slots free at step start, matching the
        # Python reference (slots freed mid-admission wait one step),
        # bucketed to power-of-two wave sizes (see _wave_quota)
        free = self.num_slots - sched.num_active
        quota = self._wave_quota(min(free, sched.num_pending)) \
            if free and sched.num_pending else 0
        wave = []
        for _ in range(quota):
            slot, uid = sched.admit()
            if slot < 0:
                break
            wave.append((slot, self._by_uid[uid]))
        if wave:
            firsts = self._prefill_batch([s for s, _ in wave],
                                         [r for _, r in wave])
            for (slot, req), tok in zip(wave, firsts):
                req.generated.append(tok)
                self.slot_req[slot] = req    # token routing only; lifecycle
                if sched.start(slot, tok):   # is owned by the C++ scheduler
                    self._finish_native(slot, req)

        active = sched.active_slots()
        if not active:
            return False
        toks0, pos = sched.decode_state()
        self.next_token[:] = toks0
        self.positions[:] = pos
        toks = self._decode_tokens()

        def record(slot, t):
            if sched.record(slot, t):
                self._finish_native(slot, self.slot_req[slot])
                return True
            return False
        self._consume(toks, active, self.positions, record)
        return True

    def _finish_native(self, slot: int, req: Request):
        req.done = True
        self.slot_req[slot] = None
        self._sched.evict(req.uid)       # bound the registries
        self._by_uid.pop(req.uid, None)

    def run_until_done(self, max_steps: int = 10_000):
        steps = 0
        while ((self.pending or self.num_active
                or (self._sched is not None and self._sched.num_pending))
               and steps < max_steps):
            self.step()
            steps += 1
        return steps
