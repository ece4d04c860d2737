"""Slot-based continuous batching for the on-slice VLM.

The reference's slow path waits on one HTTPS round trip per VLM call
(retry-forever loops, reference fsr_vln/memory/hmsg/graph/graph.py:232-255);
here requests stream through a fixed-slot decode loop: each of B cache slots
independently holds one request, prefill fills a free slot as soon as one
drains, and every decode_step advances all active slots in ONE device program
— queries admitted mid-flight join the next step (the standard continuous
batching discipline, sized by ServingConfig.max_batch).
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import vlm as vlm_mod
from ..models.tokenizer import SimpleTokenizer


@dataclass
class GenRequest:
    prompt: str
    images: Optional[np.ndarray] = None  # (N, S, S, 3) float [0,1]
    max_new_tokens: int = 32
    temperature: float = 0.0
    # filled by the batcher:
    _done: threading.Event = field(default_factory=threading.Event)
    _result: Optional[str] = None
    generated: int = 0  # actual tokens decoded (incl. the stopping EOT)
    prompt_tokens: int = 0  # prefilled positions (text + image tokens)

    def result(self, timeout: Optional[float] = None) -> str:
        self._done.wait(timeout)
        if self._result is None:
            raise TimeoutError("generation did not finish")
        return self._result


class _Slot:
    __slots__ = ("request", "tokens", "remaining", "out_ids")

    def __init__(self):
        self.request: Optional[GenRequest] = None
        self.tokens = 0
        self.remaining = 0
        self.out_ids: List[int] = []

    @property
    def active(self) -> bool:
        return self.request is not None


class ContinuousBatcher:
    """Synchronous-core batcher. `submit` is thread-safe; `step` (or the
    background `serve_forever` thread) advances the engine."""

    def __init__(
        self,
        vlm_params,
        clip_params,
        variant: vlm_mod.VLMVariant,
        tokenizer: Optional[SimpleTokenizer] = None,
        max_batch: int = 8,
        dtype=jnp.bfloat16,
        mesh=None,  # sequence-parallel prefill over the mesh's data axis for
        # prompts longer than sp_threshold tokens (SURVEY.md §5.7 gallery
        # prompts); decode stays single-program on the replicated cache
        sp_threshold: int = 512,
        chunk: int = 8,  # decode steps per device dispatch (vlm.decode_chunk);
        # admission granularity becomes `chunk` tokens — 1 restores the
        # classic per-token loop
        pipeline_depth: int = 2,  # in-flight decode chunks before the host
        # syncs: EOT/budget tracking runs INSIDE the program
        # (vlm.decode_chunk_tracked), so chunk k+1 dispatches before chunk
        # k's tokens are fetched and the tunnel RTT hides behind device
        # decode.  1 = sync every chunk (the classic loop).
    ):
        self.params = vlm_params
        self.clip_params = clip_params
        self.v = variant
        self.tok = tokenizer or SimpleTokenizer()
        self.max_batch = max_batch
        self.dtype = dtype
        self.mesh = mesh
        self.sp_threshold = sp_threshold
        self.chunk = max(1, int(chunk))
        self.pipeline_depth = max(1, int(pipeline_depth))
        self.cache = vlm_mod.init_cache(variant, max_batch, dtype)
        self.slots = [_Slot() for _ in range(max_batch)]
        self.current = jnp.zeros((max_batch,), jnp.int32)
        # device-side slot liveness: authoritative inside the decode pipeline
        # (decode_chunk_tracked), mirrored lazily on the host as fetched
        # chunks are processed
        self.d_active = jnp.zeros((max_batch,), bool)
        self.d_remaining = jnp.zeros((max_batch,), jnp.int32)
        self._eot = jnp.int32(self.tok.eot)
        self._inflight: List[tuple] = []  # (toks_dev, act_hist_dev)
        self.queue: "queue.Queue[GenRequest]" = queue.Queue()
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self.steps = 0

    # ------------------------------------------------------------------ API

    def submit(self, request: GenRequest) -> GenRequest:
        self.queue.put(request)
        return request

    def generate(self, prompt: str, images=None, max_new_tokens: int = 32) -> str:
        """Blocking single call (drives the engine inline if no thread runs)."""
        req = self.submit(GenRequest(prompt, images, max_new_tokens))
        while not req._done.is_set():
            self.step()
        return req.result()

    def serve_forever(self) -> threading.Thread:
        def loop():
            while not self._stop.is_set():
                if not self.step():
                    time.sleep(0.002)

        t = threading.Thread(target=loop, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self._stop.set()

    # ----------------------------------------------------------------- core

    def _admit(self) -> bool:
        """Admit queued requests into free slots as ONE batched device
        dispatch (vlm.admit_wave): the whole wave's prompts prefill, write
        their cache rows, and produce their first greedy tokens in a single
        program + a single host fetch.  The per-slot alternative costs ~6
        dispatches per request and dominated serving wall time on an
        RPC-tunneled device (see vlm.admit_wave docstring)."""
        wave: List[tuple] = []  # (slot index, request)
        for i, slot in enumerate(self.slots):
            if slot.active:
                continue
            try:
                req = self.queue.get_nowait()
            except queue.Empty:
                break
            wave.append((i, req))
        if not wave:
            return False

        b = self.max_batch
        ns = np.zeros((b,), np.int32)
        admit = np.zeros((b,), bool)
        wave_ids: Dict[int, np.ndarray] = {}
        wave_imgs: Dict[int, Any] = {}  # preprocessed image stacks
        any_images = False
        for i, req in wave:
            ids = [self.tok.sot] + self.tok.encode(req.prompt)
            max_len = self.v.max_seq - req.max_new_tokens - 1
            has_img = req.images is not None and len(req.images) > 0
            if has_img:
                any_images = True
                from ..models import clip as clip_mod

                cv = clip_mod.VARIANTS[self.v.clip_variant]
                wave_imgs[i] = clip_mod.preprocess_jit(
                    jnp.asarray(req.images, jnp.float32), size=cv.image_size
                )
                n_img = len(req.images) * self.v.image_tokens
                ids = ids[: max(0, max_len - n_img)]
                wave_ids[i] = np.asarray(ids, np.int32)
                ns[i] = min(n_img + len(ids), max_len)
            else:
                ids = ids[:max_len]
                wave_ids[i] = np.asarray(ids, np.int32)
                ns[i] = len(ids)
            admit[i] = True

        # bucket the wave's prompt length (64-token steps) so prefill cost
        # tracks the actual prompts, not the worst-case budget
        t = max(64, int(-(-int(ns.max()) // 64) * 64))
        t = min(t, self.v.max_seq - 1)
        ns = np.minimum(ns, t)

        # long prompts still go sequence-parallel per-request when a mesh is
        # attached (SURVEY.md §5.7); route them out of the batched wave
        sp_rows = [
            (i, req) for i, req in wave
            if self.mesh is not None and ns[i] >= self.sp_threshold
        ]
        for i, req in sp_rows:
            n = int(ns[i])
            emb = self._row_emb(i, t, ns, wave_ids, wave_imgs)
            logits, sub_cache = vlm_mod.prefill_sp(
                self.params, emb[None], jnp.asarray([n], jnp.int32),
                self.v, self.mesh, dtype=self.dtype,
            )
            self.cache = vlm_mod.KVCache(
                k=self.cache.k.at[:, i].set(sub_cache.k[:, 0]),
                v=self.cache.v.at[:, i].set(sub_cache.v[:, 0]),
                length=self.cache.length.at[i].set(n),
            )
            self.current = self.current.at[i].set(
                jnp.argmax(logits[0]).astype(jnp.int32)
            )
            admit[i] = False

        batched = [(i, req) for i, req in wave if admit[i]]
        if batched:
            if any_images and wave_imgs:
                zero = jnp.zeros((t, self.v.width), self.dtype)
                rows = [
                    self._row_emb(i, t, ns, wave_ids, wave_imgs)
                    if (i in wave_imgs or i in wave_ids) and admit[i]
                    else zero
                    for i in range(b)
                ]
                emb_wave = jnp.stack(rows)
            else:
                ids_pad = np.zeros((b, t), np.int32)
                for i in wave_ids:
                    ids_pad[i, : ns[i]] = wave_ids[i][: ns[i]]
                emb_wave = vlm_mod.text_prompt_embeddings(
                    self.params, jnp.asarray(ids_pad), jnp.asarray(ns), self.v,
                    dtype=self.dtype,
                )
            self.current, self.cache = vlm_mod.admit_wave(
                self.params, emb_wave, jnp.asarray(ns), jnp.asarray(admit),
                self.cache, self.current, self.v, dtype=self.dtype,
            )

        first = np.asarray(self.current)  # ONE blocking fetch per wave
        idxs, acts, rems = [], [], []
        for i, req in wave:
            slot = self.slots[i]
            nxt = int(first[i])
            req.prompt_tokens = int(ns[i])
            slot.request = req
            slot.remaining = req.max_new_tokens - 1
            slot.out_ids = [nxt]
            live = not (nxt == self.tok.eot or slot.remaining <= 0)
            idxs.append(i)
            acts.append(live)
            rems.append(slot.remaining)
            if not live:
                self._finish(i)
        # targeted device-mask updates: slots mid-decode keep their
        # (device-authoritative) liveness untouched
        ii = jnp.asarray(idxs, jnp.int32)
        self.d_active = self.d_active.at[ii].set(jnp.asarray(acts))
        self.d_remaining = self.d_remaining.at[ii].set(jnp.asarray(rems, jnp.int32))
        return True

    def _row_emb(self, i, t, ns, wave_ids, wave_imgs):
        """One slot's (t, W) prompt embeddings in a single device dispatch
        (vlm.image_text_prompt_embeddings / text_prompt_embeddings)."""
        n = int(ns[i])
        ids = wave_ids.get(i, np.zeros((0,), np.int32))
        if i in wave_imgs:
            # ids bucket to 64 so the jitted builder compiles once per
            # (gallery size, bucket), not per prompt length
            tid = max(64, -(-len(ids) // 64) * 64)
            pad = np.zeros((tid,), np.int32)
            pad[: len(ids)] = ids
            emb, _ = vlm_mod.image_text_prompt_embeddings(
                self.params, self.clip_params, jnp.asarray(pad),
                jnp.int32(len(ids)), wave_imgs[i], t, self.v,
                dtype=self.dtype,
            )
            return emb
        pad = np.zeros((t,), np.int32)
        pad[:n] = ids[:n]
        return vlm_mod.text_prompt_embeddings(
            self.params, jnp.asarray(pad)[None], jnp.asarray([n], jnp.int32),
            self.v, dtype=self.dtype,
        )[0]

    def _finish(self, i: int):
        slot = self.slots[i]
        req = slot.request
        ids = [t for t in slot.out_ids if t != self.tok.eot]
        req.generated = len(slot.out_ids)
        req._result = self.tok.decode(ids).strip()
        req._done.set()
        slot.request = None
        # no device-side cache reset: decode_chunk's `active` mask freezes the
        # slot and admit_wave overwrites its rows + length on readmission —
        # an eager length reset here would cost a device dispatch per request

    def step(self) -> bool:
        """Admit new requests and advance every live slot up to `chunk`
        tokens per device dispatch (vlm.decode_chunk_tracked).  Up to
        `pipeline_depth` chunks stay in flight before the host fetches the
        oldest one — EOT/budget run inside the program, so the dispatches
        queue back-to-back on the device and the tunnel round-trip hides
        behind decode compute.  Returns True if any work was done."""
        with self._lock:
            admitted = self._admit()
            host_live = any(s.active for s in self.slots)
            if host_live:
                toks, act_hist, self.current, self.cache, self.d_active, \
                    self.d_remaining = vlm_mod.decode_chunk_tracked(
                        self.params, self.current, self.cache,
                        self.d_active, self.d_remaining, self._eot,
                        self.v, steps=self.chunk, dtype=self.dtype,
                    )
                self._inflight.append((toks, act_hist))
                self.steps += 1
            elif not self._inflight:
                return admitted
            # drain: sync the oldest chunk(s) once the pipeline is full — or
            # everything, when no slot is live to feed further dispatches
            target = self.pipeline_depth - 1 if host_live else 0
            while len(self._inflight) > target:
                toks_d, act_d = self._inflight.pop(0)
                toks = np.asarray(toks_d)  # blocking fetch (the sync point)
                acts = np.asarray(act_d)
                for i, slot in enumerate(self.slots):
                    if not slot.active:
                        continue
                    for s in range(toks.shape[0]):
                        if not acts[s, i]:
                            break
                        tok = int(toks[s, i])
                        slot.out_ids.append(tok)
                        slot.remaining -= 1
                        if tok == self.tok.eot or slot.remaining <= 0:
                            # the device mask froze this slot at the same
                            # point (decode_chunk_tracked); surplus chunk
                            # positions carry act_hist False and are skipped
                            self._finish(i)
                            break
            return True
