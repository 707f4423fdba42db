#!/usr/bin/env python
"""Batched PSG inference server — the production-serving surface.

The reference has no serving story (its inference surface is the batch
tools, tools/infer.py:65-188 / tools/predict.py:34-102); deployments
would wrap `inference_detector` per request.  On TPU the economics
differ: programs are compiled per resolution bucket and the chip is fed
best by batches, so this server owns the device loop and micro-batches
concurrent requests:

  * requests are decoded + preprocessed on the HTTP handler threads
    (host-side, parallel), then queued;
  * a single device-owner thread drains the queue, groups requests by
    resolution bucket, pads to the static ``--batch-size`` and runs the
    same jitted programs as tools/infer.py (``infer`` / dp-sharded
    ``infer_batch``);
  * buckets are compiled at startup (``--no-warmup`` skips), so request
    latency never includes a compile.

API (stdlib http.server, zero dependencies):
  POST /infer     body = image bytes (PNG/JPEG/...; cv2-decodable)
                  → JSON record shaped like tools/predict.py output:
                    {relations (1-indexed), relation_scores,
                     segments_info, pan_seg_png (base64 PNG, rgb2id ids),
                     object_id_list}
  GET  /healthz   → {"status": "ok", device, buckets, batch_size}

Model loading mirrors tools/infer.py (config + part-checkpoint, epoch
mapped via saved meta).
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import queue
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8265)
    ap.add_argument("--batch-size", type=int, default=1,
                    help="max images per device step; >1 uses the "
                         "dp-sharded batched path")
    ap.add_argument("--micro-batch", action="store_true",
                    help="with --batch-size > 1 on ONE chip (v4): use the "
                         "pipelined program (sequential segmenter + one "
                         "flattened LLM decode) instead of vmap — plain "
                         "vmap batch>1 OOMs next to the 7 GB int8 LLM")
    ap.add_argument("--max-wait-ms", type=float, default=10.0,
                    help="micro-batch window: how long the device loop "
                         "waits to fill a batch after the first request")
    ap.add_argument("--img-scale", type=int, nargs=2, default=(1333, 1333))
    ap.add_argument("--single-bucket", action="store_true",
                    help="pad everything to the square cap (one program)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip the startup compile of each bucket")
    ap.add_argument("--decode-trip-budget", type=int, default=None,
                    help="tail-latency SLO knob (v4): cap LLM decode at N "
                         "while_loop trips per request.  A RUNTIME scalar "
                         "in the compiled program — changing it never "
                         "recompiles; each capped trip saves ~11 ms of "
                         "HBM-bound weight streaming at the 7B int8 "
                         "geometry.  Default: uncapped (max_new_tokens).")
    return ap.parse_args(argv)


class _Job:
    __slots__ = ("ex", "bucket", "event", "result", "error", "cancelled")

    def __init__(self, ex, bucket):
        self.ex, self.bucket = ex, bucket
        self.event = threading.Event()
        self.result = self.error = None
        self.cancelled = False  # set by submit() on timeout; the device
        #                         loop drops the job instead of burning a
        #                         full inference step on a dead request


class InferenceService:
    """Owns the model + device loop; thread-safe ``submit``."""

    def __init__(self, model, preproc, batch_size=1, max_wait_s=0.01,
                 mesh=None, micro_batch=False):
        self.model = model
        self.preproc = preproc
        self.batch_size = max(batch_size, 1)
        self.max_wait_s = max_wait_s
        self.mesh = mesh
        self.micro_batch = micro_batch  # single-chip pipelined program
        self.queue: "queue.Queue[_Job]" = queue.Queue()
        self._stop = threading.Event()
        self.worker = threading.Thread(target=self._loop, daemon=True)
        self.worker.start()

    # -- client side ----------------------------------------------------
    def _make_job(self, image_rgb: np.ndarray) -> _Job:
        bucket = self.preproc.bucket_for(*image_rgb.shape[:2])
        ex = self.preproc(image_rgb, bucket=bucket)
        ex["ori"] = image_rgb.shape[:2]
        return _Job(ex, bucket)

    def submit(self, image_rgb: np.ndarray, timeout: float = 1800.0):
        """Preprocess + enqueue one image; block until its result.  (The
        generous timeout covers a cold compile under ``--no-warmup``.)"""
        job = self._make_job(image_rgb)
        self.queue.put(job)
        if not job.event.wait(timeout):
            job.cancelled = True
            raise TimeoutError("inference timed out")
        if job.error is not None:
            raise job.error
        return job.result, job.ex

    # -- device side -----------------------------------------------------
    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self.queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.time() + self.max_wait_s
            while len(batch) < self.batch_size:
                rest = deadline - time.time()
                if rest <= 0:
                    break
                try:
                    batch.append(self.queue.get(timeout=rest))
                except queue.Empty:
                    break
            groups = {}
            for job in batch:
                if not job.cancelled:
                    groups.setdefault(job.bucket, []).append(job)
            for jobs in groups.values():
                self._run_group(jobs)

    def _run_group(self, jobs):
        jobs = [j for j in jobs if not j.cancelled]
        if not jobs:
            return
        try:
            if len(jobs) == 1:
                for job in jobs:
                    job.result = self.model.infer(
                        job.ex["image"].astype(np.float32),
                        job.ex["img_shape"],
                    )
                    job.event.set()
                return
            B = self.batch_size
            pads = B - len(jobs)
            imgs = np.stack(
                [j.ex["image"].astype(np.float32) for j in jobs]
                + [jobs[-1].ex["image"].astype(np.float32)] * pads
            )
            hws = np.stack(
                [np.asarray(j.ex["img_shape"], np.int32) for j in jobs]
                + [np.asarray(jobs[-1].ex["img_shape"], np.int32)] * pads
            )
            if self.micro_batch:
                results = self.model.infer_microbatch(imgs, hws)
            else:
                results = self.model.infer_batch(imgs, hws, mesh=self.mesh)
            for job, res in zip(jobs, results):
                job.result = res
                job.event.set()
        except Exception as e:  # surface device errors to the caller
            for job in jobs:
                if not job.event.is_set():
                    job.error = e
                    job.event.set()

    def warmup(self):
        """Compile every bucket's program(s) before serving: the single-
        image program always, plus the padded batched program when
        ``batch_size > 1`` (an under-filled window still runs singles)."""
        buckets = list(self.preproc.buckets or [self.preproc.bucket_hw])
        for b in buckets:
            img = np.zeros((b[0], b[1], 3), np.uint8)
            for n in {1, self.batch_size}:
                t0 = time.time()
                jobs = [self._make_job(img) for _ in range(n)]
                for j in jobs:
                    self.queue.put(j)
                for j in jobs:
                    j.event.wait(1800.0)
                    if j.error is not None:
                        raise j.error
                print(f"warmed bucket {b[0]}x{b[1]} batch {n} "
                      f"in {time.time() - t0:.1f}s", flush=True)

    def stop(self):
        self._stop.set()
        self.worker.join(timeout=5)


def _record_for(res, ex, seed: int):
    """tools/predict.py-shaped output record for one inference result;
    painting/segments_info/1-indexing shared with predict.py and
    SubmissionWriter via utils.submission.paint_panoptic."""
    import cv2

    from openpsg_tpu import native
    from openpsg_tpu.utils.submission import (
        paint_panoptic_indexed,
        relations_1indexed,
    )

    nh, nw = ex["img_shape"]
    oh, ow = ex["ori"]
    pan_ori = cv2.resize(
        res["pan_results"][:nh, :nw].astype(np.float64), (ow, oh),
        interpolation=cv2.INTER_NEAREST,
    ).astype(np.int64)
    idx, palette, segments_info, kept, _ = paint_panoptic_indexed(
        pan_ori, res["rel_results"]["object_id_list"], seed=seed
    )
    png = native.encode_palette_png(idx, palette)   # host fast path
    if png is None:                                  # no toolchain: cv2
        ok, enc = cv2.imencode(".png", palette[..., ::-1][idx])
        assert ok
        png = enc.tobytes()
    return dict(
        object_id_list=kept,
        relations=relations_1indexed(res["rel_results"]["relation"]),
        relation_scores=[float(s) for s in res.get("rel_scores", [])],
        segments_info=segments_info,
        pan_seg_png=base64.b64encode(png).decode("ascii"),
    )


def make_server(args):
    """Build (http.server instance, service).  Split from main() so tests
    can bind port 0 and drive requests in-process."""
    import cv2
    import jax

    from openpsg_tpu.utils.logging import honor_platform_env
    honor_platform_env()

    from openpsg_tpu.core.builder import build_detector_from_config
    from openpsg_tpu.core.config import Config
    from openpsg_tpu.data.preprocess import Preprocessor, aspect_buckets
    from openpsg_tpu.models.detectors.psg_v4 import PSGv4
    from openpsg_tpu.train.checkpoint import restore_trainable_for_inference

    cfg = Config.fromfile(args.config)
    model = build_detector_from_config(cfg, jax.random.PRNGKey(args.seed))
    if args.checkpoint and os.path.isdir(args.checkpoint):
        step, meta = restore_trainable_for_inference(
            model, cfg, args.checkpoint, epoch=args.epoch,
            is_v4=isinstance(model, PSGv4),
        )
        print(f"restored trainable params from step {step} "
              f"(epoch {meta.get('epoch')})")
    if args.decode_trip_budget is not None:
        if not hasattr(model, "decode_trip_budget"):
            sys.exit("--decode-trip-budget requires a v4 (LLM-decode) model")
        model.decode_trip_budget = args.decode_trip_budget
        print(f"decode trip budget: {args.decode_trip_budget} "
              f"(runtime cap, no recompile)")

    H, W = model._model_hw()
    scale = (min(args.img_scale), min(args.img_scale))
    if Preprocessor(scale=scale).bucket_hw[0] > H:
        scale = (H, H)
    preproc = Preprocessor(
        scale=scale,
        buckets=None if args.single_bucket else aspect_buckets(scale),
    )

    # --micro-batch is the single-chip pipelined program: never build a dp
    # mesh for it, even on a multi-chip host where batch_size would divide
    # the device count (the two batching modes are alternatives)
    mesh = None
    if args.batch_size > 1 and not args.micro_batch:
        from openpsg_tpu.parallel.mesh import make_mesh

        ndev = jax.device_count()
        if ndev > 1 and args.batch_size % ndev == 0:
            mesh = make_mesh(dp=ndev, tp=1)

    if args.micro_batch:
        assert isinstance(model, PSGv4), "--micro-batch is a v4 path"
    service = InferenceService(
        model, preproc, batch_size=args.batch_size,
        max_wait_s=args.max_wait_ms / 1e3, mesh=mesh,
        micro_batch=args.micro_batch,
    )

    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    device = str(jax.devices()[0])
    buckets = [list(b) for b in (preproc.buckets or [preproc.bucket_hw])]
    seed = args.seed

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, dict(
                    status="ok", device=device, buckets=buckets,
                    batch_size=service.batch_size,
                ))
            else:
                self._json(404, dict(error="unknown path"))

        def do_POST(self):
            if self.path != "/infer":
                self._json(404, dict(error="unknown path"))
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n)
                img_bgr = cv2.imdecode(
                    np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR
                )
                if img_bgr is None:
                    self._json(400, dict(error="undecodable image"))
                    return
                t0 = time.time()
                res, ex = service.submit(img_bgr[..., ::-1])
                rec = _record_for(res, ex, seed)
                rec["latency_ms"] = round((time.time() - t0) * 1e3, 1)
                self._json(200, rec)
            except Exception as e:  # pragma: no cover - defensive
                self._json(500, dict(error=repr(e)))

        def log_message(self, fmt, *a):  # quiet access log
            pass

    httpd = ThreadingHTTPServer((args.host, args.port), Handler)
    return httpd, service


def main():
    args = parse_args()
    httpd, service = make_server(args)
    if not args.no_warmup:
        service.warmup()
    host, port = httpd.server_address[:2]
    print(f"serving on http://{host}:{port}  (POST /infer, GET /healthz)",
          flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        service.stop()
        httpd.server_close()


if __name__ == "__main__":
    main()
