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
                 use_native: bool = True):
        self.llm = llm
        self.num_slots = num_slots
        self.caches = llm.new_caches(num_slots)
        self.positions = np.zeros(num_slots, np.int32)
        self.next_token = np.zeros(num_slots, np.int32)
        self.slot_req: List[Optional[Request]] = [None] * num_slots
        self._uid = 0
        self.pending: List[Request] = []
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
        return [i for i, r in enumerate(self.slot_req) if r is None]

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
        llm = self.llm
        tokens = jnp.asarray([req.prompt], jnp.int32)
        one_caches = llm.new_caches(1)
        logits, one_caches = llm._prefill(llm.qw, llm.cfg, tokens,
                                          one_caches, 0)
        self.caches = [
            jtu.tree_map(lambda full, one: full.at[slot].set(one[0]), c, oc)
            for c, oc in zip(self.caches, one_caches)]
        return int(jnp.argmax(logits[0, -1]))

    # -- engine step ---------------------------------------------------------
    def step(self):
        """Admit pending requests into free slots, then decode one token for
        every active slot."""
        if self._sched is not None:
            return self._step_native()
        for slot in self._free_slots():
            if not self.pending:
                break
            self._prefill_into_slot(slot, self.pending.pop(0))

        active = [i for i, r in enumerate(self.slot_req) if r is not None]
        if not active:
            return False

        tokens = jnp.asarray(self.next_token[:, None], jnp.int32)
        idx = jnp.asarray(self.positions, jnp.int32)
        logits, self.caches = self.llm._decode(
            self.llm.qw, self.llm.cfg, tokens, self.caches, idx)
        new_tok = np.asarray(jnp.argmax(logits[:, -1], axis=-1), np.int32)
        for slot in active:
            req = self.slot_req[slot]
            req.generated.append(int(new_tok[slot]))
            self.positions[slot] += 1
            self.next_token[slot] = new_tok[slot]
            self._maybe_finish(slot)
        return True

    def _step_native(self):
        sched = self._sched
        # admit at most the number of slots free at step start, matching the
        # Python reference (slots freed mid-admission wait one step)
        for _ in range(self.num_slots - sched.num_active):
            slot, uid = sched.admit()
            if slot < 0:
                break
            req = self._by_uid[uid]
            tok = self._prefill_llm(req, slot)
            req.generated.append(tok)
            self.slot_req[slot] = req        # token routing only; lifecycle
            if sched.start(slot, tok):       # is owned by the C++ scheduler
                self._finish_native(slot, req)

        active = sched.active_slots()
        if not active:
            return False
        toks, pos = sched.decode_state()
        logits, self.caches = self.llm._decode(
            self.llm.qw, self.llm.cfg,
            jnp.asarray(toks[:, None], jnp.int32), self.caches,
            jnp.asarray(pos, jnp.int32))
        new_tok = np.asarray(jnp.argmax(logits[:, -1], axis=-1), np.int32)
        for slot in active:
            req = self.slot_req[slot]
            t = int(new_tok[slot])
            req.generated.append(t)
            if sched.record(slot, t):
                self._finish_native(slot, req)
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
