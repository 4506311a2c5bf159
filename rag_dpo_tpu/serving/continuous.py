"""Continuous batching for the TPU-served decoder.

The micro-batched decode path (providers/tpu_llm.py) groups requests
that ARRIVE together; a group then decodes in lockstep, so one long
generation holds the whole batch and late arrivals wait for the next
group. Modern inference engines instead admit requests at step
granularity into a fixed pool of decode SLOTS — this module is that
engine, built TPU-natively on static shapes:

* the KV cache is ONE pre-allocated [slots, max_seq, ...] tree; a slot
  is the unit of admission;
* prefill runs per request at batch 1 (its own jit program) and the
  resulting single-row cache/logits are scattered into the pool with a
  jitted `dynamic_update_index_in_dim` over the carry tree — no
  recompilation, slot index is a traced scalar;
* decode advances ALL slots together through the same chunked scan
  program the streaming path uses (`TextGenerator._decode_chunk`);
  free slots ride along masked `done` (they emit pad into nowhere);
* completion is per-slot: EOS or the request's own token budget frees
  the slot immediately and the next queued request joins at the next
  chunk boundary — a short answer never waits for a long neighbor.

Correctness guarantees (tests/test_continuous.py): a request's output
is identical to its solo `generate_ids` run regardless of when it
joins, what shares the pool, or how often its slot was reused — cache
isolation comes from the overwrite-on-insert plus the causal mask
(`key_pos <= q_pos` hides any stale rows beyond the new occupant's
length).

Limitations (documented, not hidden): one SamplingConfig per engine
(per-slot temperatures would need a per-row temperature vector in the
decode program), and prompts bucket to `prompt_buckets` lengths so the
prefill program count stays bounded.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import DecoderModel
from ..models.generate import SamplingConfig, TextGenerator


@dataclasses.dataclass
class _Request:
    rid: int
    ids: np.ndarray          # [S] bucketed prompt
    length: int
    max_new: int
    tokens: list[int] = dataclasses.field(default_factory=list)
    slot: int = -1
    done: bool = False
    on_token: Callable | None = None


class ContinuousEngine:
    """Step-level continuous batching over a fixed slot pool."""

    def __init__(self, generator: TextGenerator, *, slots: int = 8,
                 sampling: SamplingConfig | None = None,
                 chunk: int = 4, rng_seed: int = 0):
        self.gen = generator
        self.cfg = generator.config
        self.slots = int(slots)
        self.sampling = sampling or SamplingConfig()
        self.chunk = int(chunk)
        self._params = generator.load()
        self._rid = itertools.count()
        self._queue: list[_Request] = []
        self._active: dict[int, _Request] = {}   # slot → request
        self._requests: dict[int, _Request] = {}  # rid → request (all)
        self.stats = {"steps": 0, "tokens": 0, "admitted": 0,
                      "occupancy_sum": 0}

        # probe dtypes with a 1-row prefill, then build the pool carry
        probe_ids = jnp.full((1, 8), self.sampling.pad_id, jnp.int32)
        logits1, _ = generator._prefill(1, 8)(
            self._params, probe_ids, jnp.ones((1,), jnp.int32))
        b = self.slots
        self._carry = (
            jnp.zeros((b,) + logits1.shape[1:], logits1.dtype),
            DecoderModel.init_cache(self.cfg, b),
            jnp.zeros((b,), jnp.int32),
            jnp.ones((b,), bool),                 # done=True → slot free
            jax.random.key(rng_seed),
        )
        self._insert_jit = jax.jit(self._insert_fn)
        self._release_jit = jax.jit(self._release_fn)

    # ---------------------------------------------------------- jit bits
    @staticmethod
    def _insert_fn(carry, slot, logits1, caches1, length1):
        logits, caches, pos, done, rng = carry
        upd = lambda full, one: jax.lax.dynamic_update_index_in_dim(
            full, one[0], slot, axis=0)
        logits = upd(logits, logits1)
        caches = jax.tree.map(upd, caches, caches1)
        pos = pos.at[slot].set(length1)
        done = done.at[slot].set(False)
        return (logits, caches, pos, done, rng)

    @staticmethod
    def _release_fn(carry, slot):
        logits, caches, pos, done, rng = carry
        return (logits, caches, pos, done.at[slot].set(True), rng)

    # ------------------------------------------------------------ public
    def submit(self, prompt_ids, length: int, max_new: int,
               on_token: Callable | None = None) -> int:
        """Queue a request; returns its id. `on_token(rid, token_id)`
        fires per decoded token (streaming). Admission happens at the
        next `step()` if a slot is free."""
        from ..tokenize.base import bucket_length

        ids = np.asarray(prompt_ids, np.int32).reshape(-1)
        length = min(int(length), len(ids))
        # bucket the prompt so the prefill program count stays bounded
        s = min(bucket_length(max(len(ids), 1)),
                self.cfg.max_seq_len - max_new)
        assert length <= s, (
            f"prompt length {length} + max_new {max_new} exceeds "
            f"max_seq_len {self.cfg.max_seq_len}")
        padded = np.full((s,), self.sampling.pad_id, np.int32)
        padded[:min(len(ids), s)] = ids[:s]
        ids = padded
        req = _Request(rid=next(self._rid), ids=ids, length=int(length),
                       max_new=int(max_new), on_token=on_token)
        self._queue.append(req)
        self._requests[req.rid] = req
        return req.rid

    def _admit(self):
        free = [s for s in range(self.slots) if s not in self._active]
        while free and self._queue:
            slot = free.pop(0)
            req = self._queue.pop(0)
            s = len(req.ids)
            logits1, caches1 = self.gen._prefill(1, s)(
                self._params, jnp.asarray(req.ids[None]),
                jnp.asarray([req.length], jnp.int32))
            self._carry = self._insert_jit(
                self._carry, jnp.int32(slot), logits1, caches1,
                jnp.int32(req.length))
            req.slot = slot
            self._active[slot] = req
            self.stats["admitted"] += 1

    def step(self) -> int:
        """Admit what fits, advance every active slot by `chunk`
        tokens, harvest, free finished slots. Returns the number of
        live tokens emitted."""
        self._admit()
        if not self._active:
            return 0
        decode = self.gen._decode_chunk(self.slots, self.chunk,
                                        self.sampling)
        self._carry, tokens = decode(self._params, self._carry)
        tokens = np.asarray(tokens)               # [slots, chunk]
        self.stats["steps"] += 1
        self.stats["occupancy_sum"] += len(self._active)

        emitted = 0
        eos, pad = self.sampling.eos_id, self.sampling.pad_id
        for slot, req in list(self._active.items()):
            finished = False
            for t in tokens[slot]:
                t = int(t)
                if len(req.tokens) >= req.max_new:
                    finished = True
                    break
                if t == eos:
                    finished = True
                    break
                if t == pad:      # post-EOS filler inside the chunk
                    finished = True
                    break
                req.tokens.append(t)
                emitted += 1
                if req.on_token is not None:
                    req.on_token(req.rid, t)
            if finished or len(req.tokens) >= req.max_new:
                req.done = True
                self._carry = self._release_jit(self._carry,
                                                jnp.int32(slot))
                del self._active[slot]
        self.stats["tokens"] += emitted
        return emitted

    def run(self) -> dict[int, list[int]]:
        """Drive until queue and pool are empty; returns rid → tokens
        for every request ever submitted."""
        while self._queue or self._active:
            self.step()
        return {rid: req.tokens for rid, req in self._requests.items()}

    def result(self, rid: int) -> _Request:
        return self._requests[rid]

    @property
    def occupancy(self) -> float:
        return self.stats["occupancy_sum"] / max(self.stats["steps"], 1)


class ContinuousDriver:
    """Thread-safe front of a ContinuousEngine: concurrent callers
    submit and block (or stream via `on_delta`); ONE driver thread steps
    the engine while any work exists and sleeps otherwise. This is the
    serving integration — each HTTP handler thread calls `generate()`
    and its request joins whatever is already decoding at the next
    chunk boundary (the engine itself is single-threaded)."""

    def __init__(self, engine: ContinuousEngine):
        import threading

        self.engine = engine
        self._lock = threading.Lock()
        self._work = threading.Event()
        self._events: dict[int, threading.Event] = {}
        self._closed = False
        self._thread = threading.Thread(target=self._loop,
                                        name="continuous-decode",
                                        daemon=True)
        self._thread.start()

    def generate(self, prompt_ids, length: int, max_new: int,
                 on_token=None) -> list[int]:
        """Block until this request completes; returns its tokens."""
        import threading

        evt = threading.Event()
        with self._lock:
            if self._closed:
                raise RuntimeError("driver is closed")
            rid = self.engine.submit(prompt_ids, length, max_new,
                                     on_token=on_token)
            self._events[rid] = evt
            self._work.set()
        evt.wait()
        with self._lock:
            self._events.pop(rid, None)
            return self.engine._requests[rid].tokens

    def generate_stream(self, prompt_ids, length: int, max_new: int):
        """Yield this request's token ids as the pool decodes them.

        The engine's `on_token` fires on the driver thread; a queue
        bridges to the consumer. Once the request's done event is set no
        further tokens can arrive (the engine emits a request's tokens
        and marks it done inside the same `step()`), so drain-then-stop
        is race-free. The stream joins mid-flight decoding exactly like
        the blocking path — short streams finish without waiting on
        long pool neighbors."""
        import queue as _queue
        import threading

        q: _queue.Queue = _queue.Queue()
        evt = threading.Event()
        with self._lock:
            if self._closed:
                raise RuntimeError("driver is closed")
            rid = self.engine.submit(
                prompt_ids, length, max_new,
                on_token=lambda _rid, t: q.put(t))
            self._events[rid] = evt
            self._work.set()

        def _iter():
            try:
                while not evt.is_set():
                    try:
                        yield q.get(timeout=0.05)
                    except _queue.Empty:
                        continue
                while True:
                    try:
                        yield q.get_nowait()
                    except _queue.Empty:
                        break
            finally:
                with self._lock:
                    self._events.pop(rid, None)

        return _iter()

    def close(self):
        with self._lock:
            self._closed = True
            self._work.set()
        self._thread.join(timeout=10)

    def _loop(self):
        while True:
            self._work.wait()
            with self._lock:
                if self._closed:
                    return
                busy = bool(self.engine._queue or self.engine._active)
                if not busy:
                    self._work.clear()
                    continue
                self.engine.step()
                for rid, evt in list(self._events.items()):
                    if self.engine._requests[rid].done:
                        evt.set()
