"""Pipeline orchestrator: decode -> sharded TPU inference -> ordered encode.

Replaces the reference's thread/queue pipeline (SURVEY.md C9-C13;
/root/reference/video_upscaler.py:369-570) with a design that has no
cross-thread mutable state races:

- one decode thread feeding a bounded queue (backpressure, like the
  reference's prefetch_frames=32 input queue at video_upscaler.py:153);
- a single dispatcher on the main thread packs frames into batches whose
  leading axis is sharded over the device mesh and dispatches asynchronously
  (JAX async dispatch = the double-buffered feed; up to
  ``max_inflight_batches`` batches overlap host I/O with TPU compute);
- outputs return in dispatch order, so encoding needs **no reorder buffer**
  (the reference needs one — PriorityQueue + dict — only because its racing
  workers can finish out of order, and it still drops frames, §2.6 #1);
- frame accounting (decoded == inferred == encoded) is asserted at the end
  (SURVEY.md §5 race-detection equivalent).

Resilience (absent in the reference, SURVEY.md §5): optional segmented
output with a progress manifest enables resuming a killed job; Ctrl-C
finalizes the container cleanly instead of leaving a corrupt file.
"""

from __future__ import annotations

import dataclasses
import json
import os
import queue
import threading
import time
from pathlib import Path
from typing import List, Optional, Tuple, Union

import numpy as np

from video_restore_tpu.config import RestoreConfig
from video_restore_tpu.models.zoo import ModelHandle, get_model
from video_restore_tpu.ops.tiles import (
    TileGrid,
    auto_full_frame,
    auto_tile_chunk,
)
from video_restore_tpu.parallel.dispatch import ShardedUpscaler
from video_restore_tpu.parallel.mesh import frame_mesh
from video_restore_tpu.pipeline.progress import Progress
from video_restore_tpu.utils.logging import get_logger
from video_restore_tpu.utils.profiling import StageTimer, device_trace
from video_restore_tpu.video import (
    copy_audio,
    open_reader,
    open_writer,
    probe,
)

log = get_logger()

_SENTINEL = object()


@dataclasses.dataclass
class PipelineStats:
    decoded: int = 0
    inferred: int = 0
    encoded: int = 0
    wall_s: float = 0.0
    # per-stage wall-clock totals (decode-wait/dispatch/fetch/encode),
    # filled from the runner's StageTimer — consumed by bench_e2e.py
    stages: dict = dataclasses.field(default_factory=dict)

    @property
    def fps(self) -> float:
        return self.encoded / self.wall_s if self.wall_s > 0 else 0.0


class _DecodeThread(threading.Thread):
    """Producer: reader -> bounded queue (backpressure)."""

    def __init__(self, reader, q: queue.Queue, skip: int = 0):
        super().__init__(daemon=True, name="decode")
        self.reader = reader
        self.q = q
        self.skip = skip
        self.decoded = 0
        self.error: Optional[BaseException] = None
        self._stop_event = threading.Event()

    def run(self) -> None:
        try:
            for i, frame in enumerate(self.reader):
                if self._stop_event.is_set():
                    break
                if i < self.skip:
                    continue
                self.q.put(frame)
                self.decoded += 1
        except BaseException as e:  # surfaced by the consumer
            self.error = e
        finally:
            self.q.put(_SENTINEL)

    def stop(self) -> None:
        self._stop_event.set()
        # drain so a blocked put() can finish
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass


class _EncodeThread(threading.Thread):
    """Consumer: materializes device results (D2H) and writes frames, off
    the dispatch thread so fetch/encode overlap TPU compute. Items arrive
    in dispatch order through a bounded FIFO (backpressure = at most
    ``depth`` undrained batches hold device output buffers alive)."""

    def __init__(self, drain_fn, depth: int):
        super().__init__(daemon=True, name="encode")
        self.q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self.drain_fn = drain_fn
        self.error: Optional[BaseException] = None
        self._abandoned = threading.Event()

    def run(self) -> None:
        while True:
            item = self.q.get()
            if item is _SENTINEL:
                break
            if self.error is not None or self._abandoned.is_set():
                continue  # drain the queue without processing
            try:
                self.drain_fn(item)
            except BaseException as e:
                self.error = e

    def submit(self, item) -> None:
        self.q.put(item)

    def finish(self) -> None:
        """Process everything queued, then stop."""
        self.q.put(_SENTINEL)
        self.join()

    def abandon(self) -> None:
        """Stop ASAP, discarding queued batches (error path)."""
        self._abandoned.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
        self.q.put(_SENTINEL)
        self.join(timeout=30)


class VideoRestorer:
    """End-to-end restorer; models stay resident across videos (the
    reference loads models once in __init__ too, video_upscaler.py:286-291).
    """

    def __init__(
        self,
        config: RestoreConfig,
        model: Optional[ModelHandle] = None,
        mesh=None,
    ):
        self.config = config
        self.mesh = mesh if mesh is not None else frame_mesh(config.num_devices)
        if model is None:
            model = get_model(
                config.model_name,
                config.models_dir,
                allow_random=os.environ.get("VRT_ALLOW_RANDOM_WEIGHTS") == "1",
            )
        self.model = model
        if model.scale != config.scale:
            # explicit model handle overrides the name-derived scale (the
            # reference instead *forces* scale=4, video_upscaler.py:718)
            if config.outscale == float(config.scale):
                config.outscale = float(model.scale)
            config.scale = model.scale
        self._upscalers = {}  # (H, W) resolution bucket -> ShardedUpscaler
        self._probe_cache = {}  # str(path) -> VideoInfo (batch prewarm)
        n = self.mesh.devices.size
        log.info(
            "model=%s scale=%dx devices=%d tile=%d overlap=%d precision=%s "
            "enhanced=%s",
            model.name, model.scale, n, config.tile_size,
            config.tile_overlap, config.precision, config.enhanced_mode,
        )

    # ------------------------------------------------------------------
    def _upscaler_for(
        self, height: int, width: int, yuv_out: bool = False
    ) -> ShardedUpscaler:
        key = (height, width, yuv_out)
        if key not in self._upscalers:
            cfg = self.config
            tile = cfg.tile_size
            if (
                tile != 0
                and not cfg.legacy_tiling
                # tiles shard-mode parallelizes over the tile axis — a
                # single full-frame tile would leave n-1 devices idle
                and getattr(cfg, "shard_mode", "frames") != "tiles"
            ):
                ff = getattr(cfg, "full_frame", "off")
                if ff == "on":
                    tile = 0
                elif ff == "auto":
                    # full-frame upgrade: measured +14.5% body on v5e
                    # (no tile overlap MACs, taller 2D stripes) — taken
                    # whenever a TPU stripe body is active and the
                    # activation estimate fits HBM (auto_full_frame).
                    # RRDB has had a 2D-blocked body since round 3;
                    # SRVGG gained one in round 4 (srvgg_stripe2d_padded
                    # — the full-width form at 1920-wide forced bh<=16
                    # tiny stripes, a 2x halo tax, so SRVGG stayed tiled
                    # until then). auto_full_frame's activation estimate
                    # is the RRDB one, which strictly dominates SRVGG's
                    # (no 2x-res up1 buffer, conv_out is 48ch at LR).
                    from video_restore_tpu.models.rrdbnet import (
                        default_use_stripe,
                    )
                    from video_restore_tpu.models.srvgg import (
                        default_use_srvgg_stripe,
                    )
                    from video_restore_tpu.models.zoo import (
                        RRDBNetSpec,
                        SRVGGSpec,
                    )

                    stripe_ok = (
                        isinstance(self.model.spec, RRDBNetSpec)
                        and default_use_stripe()
                    ) or (
                        isinstance(self.model.spec, SRVGGSpec)
                        and default_use_srvgg_stripe()
                    )
                    if (
                        stripe_ok
                        and auto_full_frame(
                            height, width, self.model.scale,
                            frames=max(cfg.frames_per_batch, 1),
                        )
                    ):
                        tile = 0
                        log.info(
                            "full-frame mode: %dx%d fits HBM, tiling "
                            "disabled (full_frame=off restores tiles)",
                            width, height,
                        )
            grid = TileGrid.build(
                height, width,
                tile=tile,
                overlap=cfg.tile_overlap,
                scale=self.model.scale,
                mode="legacy" if cfg.legacy_tiling else "seamless",
            )
            chunk = cfg.tile_chunk
            if chunk == 0:
                chunk = auto_tile_chunk(
                    grid.rows.extract, grid.cols.extract,
                    grid.scale, grid.n_tiles,
                )
            if chunk != grid.tile_chunk:
                grid = dataclasses.replace(grid, tile_chunk=chunk)
            log.debug(
                "compiled bucket %dx%d: %d tiles of %s", width, height,
                grid.n_tiles, grid.tile_shape,
            )
            self._upscalers[key] = ShardedUpscaler(
                self.model, grid, cfg, self.mesh, yuv420_out=yuv_out
            )
        return self._upscalers[key]

    def _yuv_eligible(self, output_path, info, out_w: int, out_h: int) -> bool:
        """Emit planar I420 on-device when the sink takes it directly:
        halves D2H traffic and removes host colorspace conversion. Falls
        back to RGB when a host resize, face pass, or an RGB-only writer
        is involved."""
        cfg = self.config
        if getattr(cfg, "device_yuv", "auto") == "off":
            return False
        if cfg.face_enhance:
            return False
        scale = self.model.scale
        if out_w != info.width * scale or out_h != info.height * scale:
            return False  # host Lanczos resize needs RGB
        if out_h % 4 or out_w % 2:
            return False
        from video_restore_tpu.video.backends import writer_supports_yuv420

        return writer_supports_yuv420(output_path)

    # ------------------------------------------------------------------
    def process_video(
        self,
        input_path: Union[str, Path],
        output_path: Union[str, Path],
        *,
        show_progress: bool = True,
    ) -> bool:
        """Restore one video; returns success (reference process_video
        contract, video_upscaler.py:369-428)."""
        cfg = self.config
        t0 = time.time()
        try:
            with device_trace(getattr(cfg, "trace_dir", None)):
                stats = self._run(input_path, output_path, show_progress)
        except KeyboardInterrupt:
            log.warning("interrupted — output finalized with partial frames")
            return False
        except Exception:
            log.exception("pipeline failed for %s", input_path)
            return False
        stats.wall_s = time.time() - t0
        self.last_stats = stats  # stage breakdown for callers (bench_e2e)
        n = self.mesh.devices.size
        log.info(
            "done: %d frames in %.1fs (%.2f fps, %.2f fps/chip)",
            stats.encoded, stats.wall_s, stats.fps, stats.fps / n,
        )
        if not (stats.decoded == stats.inferred == stats.encoded):
            log.error(
                "frame accounting mismatch: decoded=%d inferred=%d encoded=%d",
                stats.decoded, stats.inferred, stats.encoded,
            )
            return False
        return True

    # ------------------------------------------------------------------
    def _run(
        self,
        input_path: Union[str, Path],
        output_path: Union[str, Path],
        show_progress: bool,
    ) -> PipelineStats:
        cfg = self.config
        from video_restore_tpu.video.y4m import is_pipe

        pipe_in = is_pipe(input_path)
        pipe_out = is_pipe(output_path)
        if pipe_in:
            # streaming: stdin is read-once, so the reader (which parses
            # the y4m header) doubles as the probe
            reader = open_reader(input_path)
            info = reader.info
        else:
            # batch mode probes during bucket prewarm; reuse that result
            # instead of a second ffprobe subprocess per video
            info = self._probe_cache.pop(str(input_path), None)
            if info is None:
                info = probe(input_path)
        scale = self.model.scale
        out_w = int(info.width * cfg.outscale)
        out_h = int(info.height * cfg.outscale)
        log.info(
            "input %dx%d -> output %dx%d  (%d frames @ %.2f fps)",
            info.width, info.height, out_w, out_h, info.frames, info.fps,
        )

        use_yuv = self._yuv_eligible(output_path, info, out_w, out_h)
        ups = self._upscaler_for(info.height, info.width, yuv_out=use_yuv)
        ups.reset_temporal()
        batch = ups.frames_per_batch * max(cfg.frames_per_batch, 1)

        # resume bookkeeping: the y4m output itself is the progress record
        # (a stream has no past to resume into)
        if pipe_out or pipe_in:
            skip, manifest_path = 0, None
        else:
            skip, manifest_path = self._resume_state(
                output_path, out_w, out_h, info.fps
            )
        stats = PipelineStats(encoded=0)

        if not pipe_in:
            reader = open_reader(input_path)
        q: queue.Queue = queue.Queue(maxsize=max(cfg.prefetch_frames, batch))
        decoder = _DecodeThread(reader, q, skip=skip)
        decoder.start()

        writer = self._open_writer(
            output_path, out_w, out_h, info.fps,
            pix_fmt="yuv420p" if use_yuv else "rgb24",
        )
        progress = Progress(info.frames, enabled=show_progress)
        if skip:
            progress.update(skip)

        resize = self._resizer(out_w, out_h, scale, info)
        timer = StageTimer()
        face_cfg = cfg.face_enhance
        # Face detection (Haar, host CPU) and region blending run on a
        # thread pool so they overlap device compute and D2H instead of
        # serializing the dispatch loop (round-1 review, weak item #6;
        # cv2/numpy release the GIL for the heavy parts).
        face_pool = None
        face_runner = None
        if face_cfg:
            from concurrent.futures import ThreadPoolExecutor

            face_pool = ThreadPoolExecutor(
                max_workers=min(8, os.cpu_count() or 4),
                thread_name_prefix="faces",
            )
            if cfg.face_model in ("auto", "gfpgan"):
                from video_restore_tpu.ops.faces import make_gfpgan_runner

                face_runner = make_gfpgan_runner(
                    models_dir=cfg.models_dir
                )
                if face_runner is not None:
                    log.info("face restorer: GFPGAN v1-clean prior")
                elif cfg.face_model == "gfpgan":
                    raise RuntimeError(
                        "--face-model gfpgan requires the GFPGANv1.4 "
                        "weights (no download possible and no cached file)"
                    )
                else:
                    log.info(
                        "face restorer: region heuristic (GFPGAN weights "
                        "unavailable)"
                    )

        def detect_batch_faces(frames):
            if not face_cfg:
                return None
            from video_restore_tpu.ops.faces import detect_faces

            return [face_pool.submit(detect_faces, f) for f in frames]

        def _enhance_one(args):
            f, boxes = args
            if not boxes:
                return f
            if face_runner is not None:
                from video_restore_tpu.ops.faces import restore_faces_learned

                return restore_faces_learned(
                    f, boxes, scale, face_runner, cfg.face_strength
                )
            from video_restore_tpu.ops.faces import enhance_face_regions

            return enhance_face_regions(f, boxes, scale, cfg.face_strength)

        def drain_one(item):
            out, valid, face_futs = item
            with timer.stage("fetch"):
                arr = np.asarray(out)  # D2H (async result)
            stats.inferred += valid  # device result materialized on host
            with timer.stage("encode"):
                frames_out = arr[:valid]
                if face_futs is not None:
                    boxes = [f.result() for f in face_futs]
                    # pool map preserves order; blending overlaps across
                    # frames while the writer consumes sequentially
                    frames_out = face_pool.map(
                        _enhance_one, zip(frames_out, boxes)
                    )
                if use_yuv:
                    for f in frames_out:
                        writer.write_yuv420(f)
                else:
                    for f in frames_out:
                        writer.write(resize(f))
            stats.encoded += valid
            progress.update(valid)
            self._checkpoint(manifest_path, stats.encoded + skip)

        # encode thread: D2H fetch + host post + write overlap TPU compute
        # (the dispatch thread never blocks on the writer); bounded queue
        # keeps at most max_inflight_batches output buffers alive.
        enc = _EncodeThread(drain_one, depth=cfg.max_inflight_batches)
        enc.start()

        pending: List[np.ndarray] = []
        eof = False
        try:
            while not eof or pending:
                # fill a batch
                with timer.stage("decode-wait"):
                    while not eof and len(pending) < batch:
                        item = q.get()
                        if item is _SENTINEL:
                            eof = True
                            if decoder.error:
                                raise RuntimeError(
                                    f"decode failed: {decoder.error}"
                                ) from decoder.error
                            break
                        pending.append(item)
                if pending and (len(pending) == batch or eof):
                    valid = len(pending)
                    frames = pending
                    if valid < batch:  # pad final batch with last frame
                        frames = frames + [frames[-1]] * (batch - valid)
                    with timer.stage("dispatch"):
                        x = np.stack(frames)
                        faces = detect_batch_faces(frames[:valid])
                        pending = []
                        enc.submit((ups.process_batch(x), valid, faces))
                if enc.error is not None:
                    raise RuntimeError(
                        f"encode failed: {enc.error}"
                    ) from enc.error
            enc.finish()
            if enc.error is not None:
                raise RuntimeError(f"encode failed: {enc.error}") from enc.error
        finally:
            if enc.is_alive():
                enc.abandon()
            decoder.stop()
            decoder.join(timeout=10)
            if face_pool is not None:
                face_pool.shutdown(wait=True)
            writer.close()
            progress.close()
            reader.close()
        timer.log_summary()
        stats.stages = dict(timer.totals)
        if hasattr(writer, "finalize"):
            writer.finalize()  # successful run: concat segments + clean up

        stats.decoded = decoder.decoded + skip
        stats.inferred += skip
        stats.encoded += skip

        if manifest_path is not None and manifest_path.exists():
            manifest_path.unlink()  # complete: clear the progress marker
        if cfg.audio_copy and not (pipe_in or pipe_out):
            copy_audio(input_path, output_path)
        return stats

    # ------------------------------------------------------------------
    def _resizer(self, out_w, out_h, scale, info):
        """Host-side Lanczos resize when outscale != model scale (the
        reference's RealESRGANer outscale behaviour, SURVEY.md §2.2)."""
        if out_w == info.width * scale and out_h == info.height * scale:
            return lambda f: f
        import cv2

        return lambda f: cv2.resize(
            f, (out_w, out_h), interpolation=cv2.INTER_LANCZOS4
        )

    # ------------------------------------------------------------------
    def _open_writer(self, output_path, w, h, fps, pix_fmt="rgb24"):
        cfg = self.config
        if cfg.segment_frames > 0:
            if str(output_path).endswith(".y4m"):
                # y4m frames are fixed-size: append mode alone is crash-safe
                from video_restore_tpu.video.y4m import Y4MWriter

                return Y4MWriter(output_path, w, h, fps, append=cfg.resume)
            from video_restore_tpu.video.segmented import SegmentedWriter

            return SegmentedWriter(
                output_path, w, h, fps,
                codec=cfg.video_codec, crf=cfg.crf, preset=cfg.preset,
                segment_frames=cfg.segment_frames, resume=cfg.resume,
                pix_fmt=pix_fmt,
            )
        codec = cfg.video_codec
        return open_writer(
            output_path, w, h, fps,
            codec=codec, crf=cfg.crf, preset=cfg.preset, pix_fmt=pix_fmt,
        )

    def _resume_state(
        self, output_path, out_w: int, out_h: int, fps: float
    ) -> Tuple[int, Optional[Path]]:
        """Returns (frames_to_skip, progress-manifest path or None).

        The manifest is advisory (observability while running); the y4m
        file itself is the source of truth for resume."""
        cfg = self.config
        if cfg.segment_frames <= 0:
            if cfg.resume:
                log.warning(
                    "resume requires --segment-frames; starting from frame 0"
                )
            return 0, None
        manifest = Path(str(output_path) + ".progress.json")
        if not str(output_path).endswith(".y4m"):
            # segmented containers (mp4/mkv/npz/...): the segment manifest
            # is the source of truth for completed frames
            from video_restore_tpu.video.segmented import SegmentedWriter

            if cfg.resume:
                done = SegmentedWriter.resume_skip(
                    output_path, out_w, out_h, fps
                )
                if done:
                    log.info("resuming at frame %d", done)
                return done, manifest
            if manifest.exists():
                manifest.unlink()
            return 0, manifest
        if cfg.resume and os.path.exists(output_path):
            # Appending frames of the wrong geometry would silently corrupt
            # the file (and mis-count the skip), so the existing header must
            # match this run's output parameters exactly.
            self._check_resume_header(output_path, out_w, out_h, fps)
            # Fixed-size y4m frames make the completed-frame count exact
            # even after a crash: trim any partial tail, keep appending.
            done = self._trim_partial_y4m(output_path)
            log.info("resuming at frame %d", done)
            return done, manifest
        if manifest.exists():
            manifest.unlink()
        if os.path.exists(output_path) and not cfg.resume:
            os.remove(output_path)
        return 0, manifest

    @staticmethod
    def _check_resume_header(path, out_w: int, out_h: int, fps: float) -> None:
        from video_restore_tpu.video.y4m import Y4MReader

        with Y4MReader(path) as r:
            info = r.info
            colorspace = r._colorspace
        problems = []
        if (info.width, info.height) != (out_w, out_h):
            problems.append(
                f"size {info.width}x{info.height} != {out_w}x{out_h}"
            )
        if abs(info.fps - fps) > 1e-3:
            problems.append(f"fps {info.fps:g} != {fps:g}")
        if colorspace != "420jpeg":
            problems.append(f"colorspace C{colorspace} != C420jpeg")
        if problems:
            raise ValueError(
                f"cannot resume into {path}: existing output does not match "
                f"this run ({'; '.join(problems)}). Remove the file or drop "
                "--resume."
            )

    @staticmethod
    def _trim_partial_y4m(path) -> int:
        """Truncate a crashed y4m output to the last complete frame;
        returns the number of complete frames."""
        from video_restore_tpu.video.y4m import Y4MReader, _plane_shapes

        with Y4MReader(path) as r:
            info = r.info
            ys, cs = _plane_shapes(info.width, info.height, r._colorspace)
        frame_bytes = len(b"FRAME\n") + ys[0] * ys[1] + 2 * cs[0] * cs[1]
        with open(path, "rb") as f:
            header = len(f.readline())
        size = os.path.getsize(path)
        frames = (size - header) // frame_bytes
        keep = header + frames * frame_bytes
        if keep < size:
            with open(path, "ab") as f:
                f.truncate(keep)
        return frames

    def _checkpoint(self, manifest_path, frames_done: int) -> None:
        if manifest_path is not None:
            manifest_path.write_text(json.dumps({"frames_done": frames_done}))

    # ------------------------------------------------------------------
    def _warmup_buckets(self, pairs) -> None:
        """Batch-mode bucket prewarm: probe every (input, output) pair,
        collect the distinct (height, width, yuv) resolution buckets, and
        compile them all up front in parallel threads. A batch job over
        mixed resolutions otherwise pays each multi-minute TPU compile
        serially, at the first frame of each new resolution; XLA compiles
        release the GIL, so N buckets warm in ~1 compile's wall time.
        Skipped when fewer than two cold buckets exist (the lazy path is
        then just as fast)."""
        cfg = self.config
        keys = {}
        for v, out in pairs:
            try:
                info = probe(v)
                self._probe_cache[str(v)] = info
            except Exception:
                continue  # unprobeable input fails in the main loop too
            out_w = int(info.width * cfg.outscale)
            out_h = int(info.height * cfg.outscale)
            yuv = self._yuv_eligible(out, info, out_w, out_h)
            keys[(info.height, info.width, yuv)] = None
        cold = [k for k in keys if k not in self._upscalers]
        if len(cold) < 2:
            return
        ups = [self._upscaler_for(h, w, yuv_out=yv) for h, w, yv in cold]
        log.info(
            "[batch] warming %d resolution buckets in parallel", len(ups)
        )
        t0 = time.time()
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            max_workers=len(ups), thread_name_prefix="warmup"
        ) as ex:
            for _ in ex.map(lambda u: u.warmup(), ups):
                pass
        log.info("[batch] warmup done in %.1fs", time.time() - t0)

    def process_batch_dir(
        self,
        input_dir: Union[str, Path],
        output_dir: Union[str, Path],
        *,
        show_progress: bool = True,
    ) -> Tuple[int, int]:
        """Batch directory mode (video_upscaler.py:723-746): process every
        video in ``input_dir`` to ``output_dir/{stem}_upscaled{suffix}``.
        Returns (succeeded, total)."""
        exts = {".mp4", ".avi", ".mov", ".mkv", ".webm", ".y4m", ".npz"}
        videos = sorted(
            p for p in Path(input_dir).iterdir() if p.suffix.lower() in exts
        )
        outdir = Path(output_dir)
        outdir.mkdir(parents=True, exist_ok=True)

        # multi-host batch: after jax.distributed.initialize (CLI
        # --multihost or env), every process sees the same sorted listing
        # and takes its round-robin share; success counts are aggregated
        # with one DCN allgather so each host reports the GLOBAL result
        import jax

        multihost = jax.process_count() > 1
        mine = videos
        if multihost:
            from video_restore_tpu.parallel.multihost import shard_items

            mine = shard_items(videos)
            log.info(
                "[batch] multihost: process %d/%d takes %d of %d videos",
                jax.process_index(), jax.process_count(),
                len(mine), len(videos),
            )
        ok = 0
        fmt = getattr(self.config, "output_format", None)
        suffix_override = "." + fmt.lstrip(".") if fmt else None
        pairs = [
            (v, outdir / f"{v.stem}_upscaled{suffix_override or v.suffix}")
            for v in mine
        ]
        if getattr(self.config, "batch_warmup", True):
            self._warmup_buckets(pairs)
        for v, out in pairs:
            log.info("[batch] %s -> %s", v.name, out.name)
            if self.process_video(v, out, show_progress=show_progress):
                ok += 1
        if multihost:
            from video_restore_tpu.parallel.multihost import (
                allgather_counts,
            )

            rows = allgather_counts([ok, len(mine)])
            ok = sum(r[0] for r in rows)
            assert sum(r[1] for r in rows) == len(videos)
        return ok, len(videos)
