"""Inference engine: request processing, single-flight concurrency, stats.

Parity surface (SURVEY.md §2.4 / §5.2): the reference serializes GPU work
with a 1-worker ThreadPoolExecutor plus an *unsynchronized* ``is_processing``
check-then-act (server.py:39-40, 190-194) — a benign TOCTOU race. Here the
busy check and the claim are one atomic ``Lock.acquire(blocking=False)``.

Request/response semantics match ``process_image_sync`` + ``edit_image``
(server.py:123-231): optional ref-image compositing via blend, input
resized to 512², seed 42, use_cfg toggling negative-prompt CFG, base64 JPEG
in/out, elapsed seconds reported.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

from qwen_image_edit_streamdiffusion_tpu.core import imaging
from qwen_image_edit_streamdiffusion_tpu.core.config import StreamConfig


class EngineBusy(Exception):
    """Another request holds the accelerator (HTTP 429)."""


class InvalidRequest(ValueError):
    """A request field failed validation (HTTP 422). Distinct from bare
    ValueError so decode errors deep in the pipeline keep the reference's
    wrapped-500 contract (server.py:226-227)."""


class ModelNotLoaded(Exception):
    """Pipeline not constructed yet (HTTP 503)."""


class _Pending:
    """A parsed edit request waiting to be coalesced into a batched
    dispatch (dynamic batching; see InferenceEngine._edit_dynamic)."""

    __slots__ = ("item", "key", "start", "event", "result", "error")

    def __init__(self, item: Dict[str, Any], key: tuple, start: float):
        self.item = item
        self.key = key
        self.start = start
        self.event = threading.Event()
        self.result: Optional[Dict[str, Any]] = None
        self.error: Optional[BaseException] = None


@dataclass
class InferenceEngine:
    pipeline: Optional[Any] = None  # EditPipeline
    # Input resize applied to every request before the pipeline (reference
    # parity: server.py:132 resizes to 512² regardless of output size — the
    # default 1024² output is an upscale edit). Configure via
    # create(input_size=...), the server's --input-size, or QIE_INPUT_SIZE.
    input_size: int = 512
    default_steps: int = 2
    # Warm the CFG variant of the serving bucket too (SURVEY §7.1 item 4):
    # a cold compile here costs minutes through the tunnel, so the first
    # use_cfg=true request must not pay it.
    warmup_cfg: bool = True
    # Also pre-compile the stream-session fused graphs (keyframe + temporal
    # refine at input_size²) so a session's first frames don't pay
    # tunnel-scale compiles (measured 168 s cold). Off by default: only
    # deployments that serve `stream_session` requests should pay the two
    # extra startup compiles (cheap on a warm persistent compile cache).
    warmup_stream: bool = False
    # False (reference parity): concurrent requests get 429. True: requests
    # queue on the lock and run serially (set via QIE_QUEUE=1 in serving).
    queue_requests: bool = False
    # >1 enables cross-request continuous batching: requests that arrive
    # while the device is busy queue, and compatible ones (same steps /
    # CFG-ness / cfg scale / condition-image count) coalesce into ONE
    # denoise dispatch of up to this many rows when the device frees —
    # leader/follower with no added timer, the batching window is exactly
    # the previous dispatch's duration. Implies queue semantics (no 429
    # for plain edits). Server: --dynamic-batch / QIE_DYNAMIC_BATCH.
    dynamic_batch: int = 0
    # Hard cap on rows a single request may dispatch (num_images clamp;
    # QIE_MAX_ROWS). Deployments should match this to the AOT-verified
    # `lower_full --rows` budget — with dynamic batching on, the
    # effective cap is min(max_rows, dynamic_batch).
    max_rows: int = 8
    _batch_queue: list = field(default_factory=list)
    _bq_lock: threading.Lock = field(default_factory=threading.Lock)
    # Bounded table of temporal-latent stream sessions (requests carrying a
    # `stream_session` id — see _edit_stream). LRU-evicted beyond this.
    max_stream_sessions: int = 4
    _sessions: Dict[str, Any] = field(default_factory=dict)
    # per-session in-flight pixel handle for stream_pipeline=true requests
    _session_pending: Dict[str, Any] = field(default_factory=dict)
    _lock: threading.Lock = field(default_factory=threading.Lock)
    total_requests: int = 0
    last_elapsed: Optional[float] = None
    # Optional DeviceWatchdog (runtime/watchdog.py): background probe of
    # the accelerator link + in-flight dispatch deadline. While unhealthy
    # every request fast-fails DeviceUnavailable (503) instead of wedging
    # the single-flight lock, and health() reports cached state without
    # touching the device. Enable via create(watchdog=True) /
    # QIE_WATCHDOG=1 (the server turns it on by default).
    watchdog: Optional[Any] = None
    # monotonic start of the in-flight device dispatch (= lock hold), read
    # by the watchdog's dispatch-overrun check
    _dispatch_start: Optional[float] = None

    # ------------------------------------------------------------------

    @classmethod
    def create(
        cls,
        preset: str = "qwen-image-edit-2509",
        config: Optional[StreamConfig] = None,
        seed: int = 0,
        warmup_runs: int = 1,
        warmup_cfg: Optional[bool] = None,
        warmup_stream: Optional[bool] = None,
        input_size: Optional[int] = None,
        dynamic_batch: Optional[int] = None,
        watchdog: Optional[bool] = None,
        transformer_path: Optional[str] = None,
        vae_path: Optional[str] = None,
        vl_path: Optional[str] = None,
        lora_path: Optional[str] = None,
        **kw,
    ) -> "InferenceEngine":
        """Build the serving pipeline. With transformer_path+vae_path the
        engine serves real converted weights (EditPipeline.from_checkpoint);
        otherwise random-init (reference server.py:66-79 loads from the HF
        hub — the converted-orbax equivalent here)."""
        from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import (
            EditPipeline,
        )

        if transformer_path or vae_path:
            if not (transformer_path and vae_path):
                raise ValueError(
                    "checkpoint serving needs BOTH transformer_path and "
                    "vae_path (vl_path/lora_path optional)"
                )
            pipe = EditPipeline.from_checkpoint(
                transformer_path, vae_path, preset=preset, config=config,
                vl_path=vl_path, lora_path=lora_path, **kw,
            )
        else:
            pipe = EditPipeline.create(preset, config=config, seed=seed, **kw)
        import os

        if warmup_cfg is None:
            warmup_cfg = os.environ.get("QIE_WARMUP_CFG", "1") == "1"
        if warmup_stream is None:
            warmup_stream = os.environ.get("QIE_WARMUP_STREAM", "0") == "1"
        if input_size is None:
            input_size = int(os.environ.get("QIE_INPUT_SIZE", "512"))
        if dynamic_batch is None:
            dynamic_batch = int(os.environ.get("QIE_DYNAMIC_BATCH", "0"))
        eng = cls(pipeline=pipe,
                  default_steps=pipe.config.num_inference_steps,
                  warmup_cfg=warmup_cfg, warmup_stream=warmup_stream,
                  input_size=input_size, dynamic_batch=dynamic_batch,
                  max_rows=int(os.environ.get("QIE_MAX_ROWS", "8")))
        if warmup_runs:
            eng.warmup(runs=warmup_runs)
        if watchdog is None:
            watchdog = os.environ.get("QIE_WATCHDOG", "0") == "1"
        if watchdog:
            # started AFTER warmup: the warmup compiles are legitimate
            # minutes-long device holds that must not trip the overrun
            # check. dispatch_deadline defaults well above the slowest
            # measured cold request compile through the tunnel (263 s).
            from qwen_image_edit_streamdiffusion_tpu.runtime.watchdog import (
                DeviceWatchdog,
            )

            eng.watchdog = DeviceWatchdog(
                interval=float(os.environ.get("QIE_PROBE_INTERVAL", "10")),
                deadline=float(os.environ.get("QIE_PROBE_DEADLINE", "5")),
                dispatch_deadline=float(
                    os.environ.get("QIE_DISPATCH_DEADLINE", "600")),
                busy_since=lambda: eng._dispatch_start,
            ).start()
        return eng

    def warmup(self, runs: int = 1) -> None:
        """AOT-compile the serving bucket matrix (reference server.py:83-95
        warms one config; here both CFG variants of the bucket when
        warmup_cfg — SURVEY §7.1 item 4). The warmup image goes through the
        same input_size resize as real requests so the compiled shapes
        match what /edit dispatches."""
        if self.pipeline is None:
            raise ModelNotLoaded("no pipeline")
        # per-phase timings: warmup through the tunnel is minutes on a
        # cold compile cache and operators need to see where boot time
        # goes (VERDICT r3 weak #5)
        t0 = time.monotonic()
        self.pipeline.warmup(height=self.input_size, width=self.input_size,
                             steps=self.default_steps, runs=runs,
                             cfg=self.warmup_cfg)
        print(f"[warmup] bucket matrix ({self.input_size}², "
              f"{self.default_steps} steps"
              f"{', +CFG' if self.warmup_cfg else ''}): "
              f"{time.monotonic() - t0:.1f}s")
        if self.dynamic_batch > 1:
            t0 = time.monotonic()
            self._warmup_row_buckets()
            print(f"[warmup] multi-row buckets (≤{self.dynamic_batch}): "
                  f"{time.monotonic() - t0:.1f}s")
        if self.warmup_stream:
            t0 = time.monotonic()
            self._warmup_stream_graphs()
            print(f"[warmup] stream graphs: {time.monotonic() - t0:.1f}s")

    def _warmup_row_buckets(self) -> None:
        """Pre-compile the multi-row denoise/decode buckets dynamic
        batching dispatches ({2, 4, ...} ≤ dynamic_batch, fast mode, plus
        CFG variants when warmup_cfg). Without this the first concurrent
        burst coalesces into a cold bucket and every coalesced client
        stalls on a tunnel-scale compile while the leader holds the
        device lock (the stream-graph analog measured 168 s cold)."""
        s = self.input_size
        img = imaging.make_test_image(s, s, "gray")
        prompt = "Transform into oil painting style"
        b = 2
        while b <= self.dynamic_batch:
            t0 = time.monotonic()
            items = [{"image": img, "prompt": prompt, "seed": i}
                     for i in range(b)]
            self.pipeline.edit_many(items,
                                    num_inference_steps=self.default_steps)
            if self.warmup_cfg:
                cfg_items = [dict(it, negative_prompt="") for it in items]
                self.pipeline.edit_many(
                    cfg_items, num_inference_steps=self.default_steps)
            print(f"[warmup]   edit rows={b}: "
                  f"{time.monotonic() - t0:.1f}s")
            b *= 2

    def _warmup_stream_graphs(self) -> None:
        """Compile the stream-session fused graphs (keyframe + temporal
        refine, no-CFG, at input_size² × default_steps — the same
        construction `_edit_stream` uses, so the jit-cache keys match).
        A throwaway session shares this engine's pipeline params and
        `_jit_cache`; only the compiled graphs survive it."""
        import dataclasses

        from qwen_image_edit_streamdiffusion_tpu.pipeline.stream import (
            RealtimePipeline,
        )

        s = self.input_size
        scfg = self.pipeline.config.replace(
            width=s, height=s, num_inference_steps=self.default_steps)
        sess = RealtimePipeline(
            pipe=dataclasses.replace(self.pipeline, config=scfg))
        sess.precompute_conditions("warmup")
        img = imaging.make_test_image(s, s, "gradient")
        t0 = time.monotonic()
        sess.process_frame(img)  # keyframe graph (full schedule)
        print(f"[warmup]   stream keyframe graph: "
              f"{time.monotonic() - t0:.1f}s")
        t0 = time.monotonic()
        sess.process_frame(img)  # temporal refine graph
        print(f"[warmup]   stream refine graph: "
              f"{time.monotonic() - t0:.1f}s")
        if self.dynamic_batch > 1:
            # multi-SESSION row buckets too: a cold coalesced burst would
            # otherwise stall every streaming client on one compile
            from qwen_image_edit_streamdiffusion_tpu.pipeline.stream import (
                submit_frames_batched,
            )

            cap = min(self.dynamic_batch, self.max_stream_sessions)
            b = 2
            while b <= cap:
                t0 = time.monotonic()
                group = []
                for _ in range(b):
                    s2 = RealtimePipeline(
                        pipe=dataclasses.replace(self.pipeline, config=scfg))
                    s2.precompute_conditions("warmup")
                    s2.process_frame(img)  # prime past the keyframe (warm)
                    group.append(s2)
                handles = submit_frames_batched(group, [img] * b)
                group[0]._collect(handles[0])
                print(f"[warmup]   stream rows={b}: "
                      f"{time.monotonic() - t0:.1f}s")
                b *= 2

    # ------------------------------------------------------------------

    def _acquire_device(self, blocking: bool) -> bool:
        """Claim the single-flight device lock with health gating: while
        the watchdog reports the accelerator unhealthy, requests fast-fail
        :class:`DeviceUnavailable` (503) instead of 429-ing forever or
        queueing behind a wedged dispatch — including requests ALREADY
        blocked on the lock (the blocking wait polls health). On success,
        stamps the dispatch start the watchdog's overrun check reads."""
        if self.watchdog is not None:
            self.watchdog.require_healthy()
        if not blocking:
            got = self._lock.acquire(blocking=False)
        elif self.watchdog is None:
            got = self._lock.acquire()
        else:
            while True:
                got = self._lock.acquire(timeout=0.5)
                if got:
                    break
                self.watchdog.require_healthy()
        if got:
            self._dispatch_start = time.monotonic()
        return got

    def _release_device(self) -> None:
        self._dispatch_start = None
        self._lock.release()

    def _join_leader_queue(self, entry: _Pending) -> bool:
        """Dynamic-batching follower path: block until this thread holds
        the device lock (→ True: run the leader body, then
        ``_release_device``), or until the entry's result was published by
        another leader while the device was unhealthy (→ False: read
        ``entry.result``/``entry.error`` directly). Raises
        :class:`~.watchdog.DeviceUnavailable` if the device goes unhealthy
        while the entry is still queued — the wedged-device case that used
        to strand every queued request forever (VERDICT r4 weak #1)."""
        from qwen_image_edit_streamdiffusion_tpu.runtime.watchdog import (
            DeviceUnavailable,
        )

        try:
            self._acquire_device(blocking=True)
            return True
        except DeviceUnavailable:
            with self._bq_lock:
                in_q = entry in self._batch_queue
                if in_q:
                    self._batch_queue.remove(entry)
            if in_q:
                raise
            # a leader already claimed this entry mid-dispatch; wait for
            # its publication, bailing out if the device stays wedged
            while not entry.event.wait(0.5):
                if self.watchdog is not None and not self.watchdog.ok:
                    raise
            return False

    def edit(self, request: Dict[str, Any]) -> Dict[str, Any]:
        """Process one EditRequest dict → EditResponse dict.

        Fields (reference server.py:43-55): image (b64), prompt, steps,
        ref_image (optional b64), blend_ratio, use_cfg. Extension beyond
        the reference wire: ref_mode — "blend" (default, reference parity:
        PIL-blend the two images into one input) or "condition" (pass the
        ref image as a SECOND condition image to the pipeline, the
        upstream `image=[a, b]` multi-image signature the reference UI
        never exposed — SURVEY.md §2.2, VERDICT r2 next #4).
        """
        if self.pipeline is None:
            raise ModelNotLoaded("Model not loaded")
        if self.dynamic_batch > 1:
            if request.get("stream_session"):
                return self._edit_stream_dynamic(request)
            return self._edit_dynamic(request)
        # Dynamic batching implies queue semantics for the whole wire (its
        # plain edits never 429) — stream-session frames arriving while a
        # coalesced dispatch holds the device must queue too, not bounce.
        blocking = self.queue_requests or self.dynamic_batch > 1
        if not self._acquire_device(blocking):
            raise EngineBusy("Server is busy processing another request")
        try:
            start = time.time()
            sid = request.get("stream_session")
            if sid:
                return self._edit_stream(str(sid), request, start)
            item = self._parse_edit(request)
            result = self.pipeline(
                item["image"],
                item["prompt"],
                negative_prompt=item["negative_prompt"],
                num_inference_steps=item["num_inference_steps"],
                true_cfg_scale=item["true_cfg_scale"],
                seed=item["seed"],
                num_images_per_prompt=item["num_images"],
            )
            return self._response(item, result, start)
        finally:
            self._release_device()

    def _parse_edit(self, request: Dict[str, Any]) -> Dict[str, Any]:
        """Validate + normalize an /edit request into a pipeline item
        (the dict shape EditPipeline.edit_many consumes).

        CFG convention parity (server.py:135-153): use_cfg passes an
        empty negative prompt (engaging true CFG); fast mode is
        cond-only. Extensions beyond the reference wire: an explicit
        negative_prompt (honored only with use_cfg, like the upstream
        do_true_cfg gate), cfg_scale (true_cfg_scale), seed (reference
        pins 42 server-side), and num_images (N seed variations in one
        denoise dispatch — "image" stays variation 0 on the wire, the
        rest ride in an additive "images" list). Explicit-None request
        values — e.g. from the FastAPI model dump — mean "use the
        default", same as an absent key. Binary transports (serving/ws.py)
        pass `image`/`ref_image` as already-decoded PIL and set
        `raw_response` so the response carries PIL back instead of
        base64 — no base64/JSON on either side of the device."""
        img = imaging.to_pil(request["image"])
        prompt = request.get("prompt", "Transform into oil painting style")
        steps = int(request.get("steps", self.default_steps))
        use_cfg = bool(request.get("use_cfg", False))

        s = self.input_size
        extra_images = []
        ref_b64 = request.get("ref_image")
        if ref_b64:
            ref_mode = request.get("ref_mode", "blend")
            if ref_mode not in ("blend", "condition"):
                # loud 422, not a silent fall-through to blend: a typo
                # like "conditon" would otherwise produce a different
                # edit with HTTP 200
                raise InvalidRequest(
                    f"ref_mode must be 'blend' or 'condition', "
                    f"got {ref_mode!r}")
            ref = imaging.to_pil(ref_b64)
            if ref_mode == "condition":
                extra_images = [imaging.resize(ref, s, s)]
            else:
                img = imaging.blend(
                    imaging.resize(img, s, s),
                    imaging.resize(ref, s, s),
                    float(request.get("blend_ratio", 0.5)),
                )

        img = imaging.resize(img, s, s)
        cfg_scale = request.get("cfg_scale")
        seed = request.get("seed")
        # num_images rows share the deployment's AOT-verified row budget
        # (DEPLOY.md `lower_full --rows`): with dynamic batching on, one
        # request must not dispatch more rows than the coalescing cap the
        # deployment was budgeted for; max_rows bounds the sessionless
        # path too (QIE_MAX_ROWS).
        cap = (min(self.max_rows, self.dynamic_batch)
               if self.dynamic_batch > 1 else self.max_rows)
        return {
            "image": [img] + extra_images,
            "prompt": prompt,
            "negative_prompt": (str(request.get("negative_prompt") or "")
                                if use_cfg else None),
            "num_inference_steps": steps,
            "true_cfg_scale": (None if cfg_scale is None
                               else float(cfg_scale)),
            "seed": 42 if seed is None else int(seed),
            "num_images": max(1, min(int(request.get("num_images") or 1),
                                     cap)),
            # binary transports (serving/ws.py): hand PIL back instead of
            # base64 — the transport JPEG-encodes at its own boundary
            "raw_response": bool(request.get("raw_response")),
        }

    def _response(self, item: Dict[str, Any], result: Any, start: float,
                  batched_with: Optional[int] = None) -> Dict[str, Any]:
        elapsed = time.time() - start
        self.total_requests += 1
        self.last_elapsed = elapsed
        enc = ((lambda im: im) if item.get("raw_response")
               else imaging.pil_to_base64)
        resp = {
            "image": enc(result.images[0]),
            "elapsed": elapsed,
            "status": "success",
        }
        if item["num_images"] > 1:
            # extras only — variation 0 is already in "image"; repeating
            # it would ship (and base64-encode) the same bytes twice
            resp["images"] = [enc(im) for im in result.images[1:]]
        if batched_with is not None and batched_with > 1:
            # additive extension field: how many requests shared the
            # denoise dispatch (lets clients/benchmarks observe coalescing)
            resp["batched_with"] = batched_with
        return resp

    def _edit_dynamic(self, request: Dict[str, Any]) -> Dict[str, Any]:
        """Cross-request continuous batching (dynamic_batch > 1).

        Leader/follower over the single device lock: every request parses
        + validates up front, enqueues, then blocks on the lock. Whoever
        holds the lock is the leader — it drains all queued requests with
        a matching compatibility key (same steps, CFG-ness, cfg scale,
        condition-image count; up to dynamic_batch total rows) and runs
        them as ONE EditPipeline.edit_many dispatch, publishing each
        result through the entry's event. A woken follower whose entry
        was served returns immediately; one whose key didn't match the
        previous leader's batch becomes the next leader. No timer: the
        batching window is exactly the in-flight dispatch's duration, so
        an idle server adds zero latency and a loaded one coalesces
        automatically (throughput scales with MXU batch efficiency
        instead of 429-rejecting, reference server.py:190-194)."""
        start = time.time()
        item = self._parse_edit(request)
        key = (item["num_inference_steps"],
               item["negative_prompt"] is not None,
               item["true_cfg_scale"],
               len(item["image"]))
        entry = _Pending(item, key, start)
        with self._bq_lock:
            self._batch_queue.append(entry)
        if self._join_leader_queue(entry):
            try:
                if not entry.event.is_set():
                    with self._bq_lock:
                        self._batch_queue.remove(entry)
                        cands, rows = [entry], [item["num_images"]]
                        for other in list(self._batch_queue):
                            if sum(rows) >= self.dynamic_batch:
                                break
                            o_rows = other.item["num_images"]
                            if (other.key == entry.key
                                    and sum(rows) + o_rows
                                    <= self.dynamic_batch):
                                cands.append(other)
                                rows.append(o_rows)
                        # Take the longest prefix whose row total is an EXACT
                        # compiled bucket: padding 3 queued rows up to the
                        # 4-bucket burns a whole extra model-row (~hundreds of
                        # ms) to save one dispatch RTT (~30 ms) — measured a
                        # net throughput LOSS. Dispatch the exact-bucket
                        # prefix now; the remainder leads the next dispatch
                        # immediately (the device never idles).
                        best = 1
                        for i in range(1, len(cands) + 1):
                            if sum(rows[:i]) in (1, 2, 4, 8, 16):
                                best = i
                        batch = cands[:best]
                        for e in batch[1:]:
                            self._batch_queue.remove(e)
                    try:
                        results = self.pipeline.edit_many(
                            [e.item for e in batch],
                            num_inference_steps=item["num_inference_steps"],
                            true_cfg_scale=item["true_cfg_scale"],
                        )
                        for e, res in zip(batch, results):
                            e.result = self._response(
                                e.item, res, e.start, batched_with=len(batch))
                    except BaseException as exc:
                        for e in batch:
                            e.error = exc
                    finally:
                        for e in batch:
                            e.event.set()
            finally:
                self._release_device()
        if entry.error is not None:
            # fresh exception per waiter: re-raising ONE shared instance
            # from K threads concurrently mutates its __traceback__, and
            # a BaseException (KeyboardInterrupt mid-dispatch) would skip
            # the server's except-Exception → 500 wire contract
            raise RuntimeError(
                f"batched dispatch failed: {entry.error}") from entry.error
        return entry.result

    def _edit_stream_dynamic(self, request: Dict[str, Any]
                             ) -> Dict[str, Any]:
        """`stream_session` requests under dynamic batching: queue
        semantics PLUS cross-session frame coalescing.

        Same leader/follower shape as :meth:`_edit_dynamic`: requests
        parse host-side, enqueue, and block on the device lock; the
        lock-holder drains every queued stream entry and serves the lot —
        compatible temporal refine frames from DIFFERENT sessions run as
        one multi-row fused dispatch (pipeline.stream
        submit_frames_batched), so N concurrent webcam users cost one
        dispatch per frame-time instead of N serialized ones. Keyframes,
        SSF sessions, preview-scale sessions and second frames of the
        same session serve individually inside the same lock hold."""
        start = time.time()
        sid = str(request.get("stream_session"))
        # host prep in the requesting thread: validation (422) surfaces
        # here, and the leader's serial work shrinks
        img, pipelined = self._parse_stream_request(request)
        entry = _Pending(
            {"request": request, "sid": sid, "img": img,
             "pipelined": pipelined},
            ("stream", sid), start)
        with self._bq_lock:
            self._batch_queue.append(entry)
        if self._join_leader_queue(entry):
            try:
                if not entry.event.is_set():
                    with self._bq_lock:
                        drained = [e for e in self._batch_queue
                                   if e.key[0] == "stream"]
                        for e in drained:
                            self._batch_queue.remove(e)
                    self._serve_stream_entries(drained)
            finally:
                self._release_device()
        if entry.error is not None:
            # fresh exception per waiter (same rationale as _edit_dynamic)
            raise RuntimeError(
                f"stream dispatch failed: {entry.error}") from entry.error
        return entry.result

    def _serve_stream_entries(self, entries: list) -> None:
        """Serve a drained batch of stream entries in waves: a session
        with several queued frames contributes one frame per wave (frame
        N+1's re-noise consumes frame N's latent — they can't share a
        dispatch)."""
        remaining = list(entries)
        while remaining:
            wave, defer, seen = [], [], set()
            for e in remaining:
                if e.item["sid"] in seen:
                    defer.append(e)
                else:
                    seen.add(e.item["sid"])
                    wave.append(e)
            self._serve_stream_wave(wave)
            remaining = defer

    def _serve_stream_wave(self, wave: list) -> None:
        """One frame per session: resolve sessions, group batchable
        temporal frames by compatibility, dispatch groups as multi-row
        fused graphs and the rest individually."""
        groups: Dict[tuple, list] = {}
        singles = []
        for e in wave:
            try:
                sess = self._resolve_stream_session(
                    e.item["sid"], e.item["request"])
            except BaseException as exc:
                e.error = exc
                e.event.set()
                continue
            c = sess.config
            kf = (sess.frame_count % c.keyframe_interval == 0
                  or sess.prev_latent is None)
            if kf or c.similarity_filter or sess._preview_scale() > 1:
                # keyframes could batch with other keyframes, but they're
                # 1-in-keyframe_interval and usually unaligned across
                # sessions; SSF needs its per-frame skip decision
                singles.append((e, sess))
                continue
            gkey = (c.num_inference_steps,
                    sess.negative_prompt is not None
                    and c.true_cfg_scale > 1.0,
                    c.true_cfg_scale, c.noise_strength,
                    c.transfer_format, c.width, c.height)
            groups.setdefault(gkey, []).append((e, sess))
        for items in groups.values():
            while items:
                # exact-bucket prefix, same economics as _edit_dynamic:
                # padding a row burns a whole extra model-row to save one
                # dispatch RTT — measured a net loss
                n = min(len(items), self.dynamic_batch)
                take = max(b for b in (1, 2, 4, 8, 16) if b <= n)
                batch, items = items[:take], items[take:]
                self._dispatch_stream_batch(batch)
        for e, sess in singles:
            self._serve_stream_one(e, sess)

    def _dispatch_stream_batch(self, batch: list) -> None:
        if len(batch) == 1:
            self._serve_stream_one(*batch[0])
            return
        from qwen_image_edit_streamdiffusion_tpu.pipeline import (
            stream as stream_mod,
        )

        try:
            handles = stream_mod.submit_frames_batched(
                [s for _, s in batch], [e.item["img"] for e, _ in batch])
        except BaseException as exc:
            for e, _ in batch:
                e.error = exc
                e.event.set()
            return
        for (e, sess), h in zip(batch, handles):
            try:
                e.result = self._serve_stream_frame(
                    e.item["sid"], sess, e.item["img"],
                    e.item["pipelined"], e.start, handle=h,
                    batched_with=len(batch),
                    raw=bool(e.item["request"].get("raw_response")))
            except BaseException as exc:
                e.error = exc
            finally:
                e.event.set()

    def _serve_stream_one(self, e: _Pending, sess: Any) -> None:
        try:
            e.result = self._serve_stream_frame(
                e.item["sid"], sess, e.item["img"], e.item["pipelined"],
                e.start,
                raw=bool(e.item["request"].get("raw_response")))
        except BaseException as exc:
            e.error = exc
        finally:
            e.event.set()

    def _edit_stream(self, sid: str, request: Dict[str, Any],
                     start: float) -> Dict[str, Any]:
        """`/edit` with a `stream_session` id: temporal-latent streaming
        over the SAME wire contract.

        The reference's React webcam tab streams by POSTing every captured
        frame to /edit, paying the full pipeline each time (App.js:147-178 →
        server.py:123-155 — its qwen_realtime.py temporal machinery was
        never reachable over HTTP). Here a request that carries a
        `stream_session` string is served by a per-session RealtimePipeline
        sharing this engine's params and compiled-graph cache: the first
        frame (and every keyframe_interval-th) runs the full schedule from
        fresh noise; frames in between re-noise the previous frame's latent
        and run only the tail refine steps — one model call per frame at
        the default 2-step config — inside ONE fused device dispatch
        (pipeline/stream.py). Output is input_size² (same-size img2img on
        the live frame), unlike the sessionless path's area-1024² upscale.

        Changing `prompt`/`use_cfg` mid-session re-freezes the prompt
        conditioning (one VL encode) but keeps the temporal latent — live
        prompt editing, StreamDiffusion semantics. `ref_mode="condition"`
        is rejected: the stream path conditions on the live frame itself.
        Sessions are LRU-bounded at max_stream_sessions; eviction only
        drops cached latent state (the next request re-anchors with a
        keyframe). Response carries extension fields `stream_session`,
        `keyframe`, `frame` on top of the reference contract.

        `stream_pipeline=true` additionally overlaps device compute with
        the wire: the request DISPATCHES its frame and returns the
        PREVIOUS frame's pixels (one frame of latency, StreamDiffusion's
        standard preview tradeoff; the local camera loop measures ~1.8×
        throughput from the same overlap) — while the client encodes,
        ships and renders frame N−1, frame N computes on-device. The
        first request of a session primes the pipeline and returns its
        own frame. Pipelined responses carry `lag`: the number of frames
        the returned image trails the submitted one (0 or 1).
        """
        img, pipelined = self._parse_stream_request(request)
        sess = self._resolve_stream_session(sid, request)
        return self._serve_stream_frame(
            sid, sess, img, pipelined, start,
            raw=bool(request.get("raw_response")))

    def _parse_stream_request(self, request: Dict[str, Any]):
        """Host-side prep of a stream-session request (decode, optional
        ref blend, resize): no session/device state touched, so dynamic
        batching runs it in the requesting thread BEFORE enqueueing —
        validation errors (422) surface there, and the leader's serial
        work shrinks."""
        img = imaging.to_pil(request["image"])
        s = self.input_size
        if request.get("ref_image"):
            ref_mode = request.get("ref_mode", "blend")
            if ref_mode != "blend":
                raise InvalidRequest(
                    "stream_session supports ref_mode='blend' only (the "
                    "stream path conditions on the live frame itself)")
            ref = imaging.to_pil(request["ref_image"])
            img = imaging.blend(
                imaging.resize(img, s, s), imaging.resize(ref, s, s),
                float(request.get("blend_ratio", 0.5)),
            )
        img = imaging.resize(img, s, s)
        return img, bool(request.get("stream_pipeline"))

    def _resolve_stream_session(self, sid: str, request: Dict[str, Any]):
        """Look up / create the session and sync it to the request's
        steps + prompt conditioning. Touches the LRU table and may run a
        VL encode — call with the device lock held."""
        import dataclasses

        from qwen_image_edit_streamdiffusion_tpu.pipeline.stream import (
            RealtimePipeline,
        )

        prompt = request.get("prompt", "Transform into oil painting style")
        steps = int(request.get("steps", self.default_steps))
        use_cfg = bool(request.get("use_cfg", False))
        s = self.input_size

        sess = self._sessions.pop(sid, None)
        if sess is None:
            while len(self._sessions) >= self.max_stream_sessions:
                evicted = next(iter(self._sessions))
                del self._sessions[evicted]
                self._session_pending.pop(evicted, None)
            scfg = self.pipeline.config.replace(
                width=s, height=s, num_inference_steps=steps)
            sess = RealtimePipeline(
                pipe=dataclasses.replace(self.pipeline, config=scfg))
        self._sessions[sid] = sess  # (re)insert = LRU most-recent

        if sess.config.num_inference_steps != steps:
            sess.pipe.config = sess.config.replace(
                num_inference_steps=steps)
        negative = (str(request.get("negative_prompt") or "")
                    if use_cfg else None)
        if (sess._frozen_txt is None or sess.prompt != prompt
                or sess.negative_prompt != negative):
            sess.precompute_conditions(prompt, negative)
        return sess

    def _serve_stream_frame(self, sid: str, sess: Any, img: Any,
                            pipelined: bool, start: float,
                            handle: Any = None,
                            batched_with: Optional[int] = None,
                            raw: bool = False,
                            ) -> Dict[str, Any]:
        """Dispatch/collect one session frame and build the wire response.
        `handle` set means the frame was already dispatched as a row of a
        coalesced multi-session batch (submit_frames_batched) — only
        collection remains."""
        lag = None
        if pipelined:
            t0 = time.time()
            if handle is None:
                handle = sess.submit_frame(img)
            prev = self._session_pending.get(sid)
            if prev is None:
                # prime: return the own frame but KEEP it pending so the
                # next request enters steady lag-1 overlap (it re-serves
                # this frame once — one duplicate display, then 1/compute
                # throughput)
                out, lag = sess._collect(handle), 0
            else:
                out, lag = sess._collect(prev), 1
            self._session_pending[sid] = handle
            sess.inference_times.append(time.time() - t0)
        else:
            # a session switching pipelined→sync must not strand an
            # in-flight frame; its latent already chained device-side
            self._session_pending.pop(sid, None)
            if handle is not None:
                t0 = time.time()
                out = sess._collect(handle)
                sess.inference_times.append(time.time() - t0)
            else:
                out = sess.process_frame(img)
        elapsed = time.time() - start
        self.total_requests += 1
        self.last_elapsed = elapsed
        resp = {
            "image": out if raw else imaging.pil_to_base64(out),
            "elapsed": elapsed,
            "status": "success",
            "stream_session": sid,
            "keyframe": bool(sess.is_keyframe),
            "frame": sess.frame_count,
        }
        if lag is not None:
            resp["lag"] = lag
        if batched_with is not None and batched_with > 1:
            resp["batched_with"] = batched_with
        return resp

    # ------------------------------------------------------------------
    # Profiling (SURVEY.md §5.1: reference has wall-clock prints only; we
    # add a jax.profiler trace endpoint on top of the same stats surface)
    # ------------------------------------------------------------------

    _trace_dir: Optional[str] = None

    def start_trace(self, log_dir: str = "/tmp/qie_trace") -> Dict[str, Any]:
        import jax

        if self._trace_dir is not None:
            raise RuntimeError(f"trace already running → {self._trace_dir}")
        jax.profiler.start_trace(log_dir)
        self._trace_dir = log_dir
        return {"status": "tracing", "log_dir": log_dir}

    def stop_trace(self) -> Dict[str, Any]:
        import jax

        if self._trace_dir is None:
            raise RuntimeError("no trace running")
        jax.profiler.stop_trace()
        d, self._trace_dir = self._trace_dir, None
        return {"status": "stopped", "log_dir": d}

    # ------------------------------------------------------------------

    def health(self) -> Dict[str, Any]:
        """Reference-parity fields (server.py:172-180) plus, when the
        watchdog is on, device-health extensions — and in that mode this
        NEVER touches the device itself: the memory number and probe state
        are cached from the watchdog's probe thread, so /health answers in
        microseconds even while the accelerator link is wedged (the
        reference's /health — and round-4's — would hang right along with
        the device)."""
        mem = "N/A"
        if self.watchdog is not None:
            b = self.watchdog.memory_stats.get("bytes_in_use")
            if b:
                mem = f"{b / 1e9:.2f} GB"
        else:
            try:
                import jax

                stats = jax.devices()[0].memory_stats()
                if stats and "bytes_in_use" in stats:
                    mem = f"{stats['bytes_in_use'] / 1e9:.2f} GB"
            except Exception:
                pass
        out = {
            "status": "ok",
            "model_loaded": self.pipeline is not None,
            "optimized": f"jit+flash-attn ({self.default_steps}-step)",
            "inference_time": (
                f"{self.last_elapsed:.2f}s" if self.last_elapsed else "n/a"
            ),
            "gpu_memory": mem,
            "requests": self.total_requests,
        }
        if self.watchdog is not None:
            out.update(self.watchdog.status())
            if not self.watchdog.ok:
                out["status"] = "degraded"
        return out
