"""Long-running segmentation server over a directory of cases (ROADMAP #10).

The reference's predict path (script/predict.py) loads the model and
compiles per invocation; this server loads the checkpoint ONCE, keeps the
folded/compiled predict program resident (the Predictor caches one jitted
program per volume shape), and streams cases through it:

  * batch mode (``run_once``): segment every unprocessed case directory
    under ``input_root`` and exit;
  * watch mode (``run``): poll ``input_root`` for newly arrived cases and
    segment them as they appear — a minimal TPU serving loop with no
    framework dependencies.

A case is any subdirectory of ``input_root`` containing at least one
modality subdirectory (the same per-modality layout script/predict.py:29-67
consumes). A case becomes *ready* only when every configured modality is
present, OR when its directory has been quiescent for ``min_age`` seconds
(so partially-uploaded cases aren't zero-filled mid-copy and then marked
done forever). Completed cases are skipped by their existing output file
— written atomically (tmp + rename), so a crash mid-write can't leave a
truncated output posing as a completion marker.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

from pcmseg_tpu.core.config import Config
from pcmseg_tpu.infer.predict import Predictor, _find_volume_file
from pcmseg_tpu.utils.logging import get_logger
from pcmseg_tpu.utils.profiling import StepTraceController, annotate


class PredictionServer:
    """Resident Predictor + directory polling loop."""

    def __init__(
        self,
        config: Config,
        checkpoint_path: str,
        input_root: str,
        output_dir: str,
        output_name: str = "segmentation.nii.gz",
        explicit=(),
        min_age: float = 30.0,
        max_attempts: int = 3,
    ):
        self.input_root = input_root
        self.output_dir = output_dir
        self.output_name = output_name
        self.log = get_logger("pcmseg.serve")
        self.predictor = Predictor(config, checkpoint_path, explicit=explicit)
        # the Predictor may have adopted the checkpoint's own config
        # (modalities, normalization, ...) from meta.json — discovery must
        # use the SAME view, or the server would poll for modality subdirs
        # the checkpoint doesn't use and idle forever
        self.config = self.predictor.config
        self.min_age = min_age
        self.max_attempts = max_attempts
        # per-case failure counts: a case that keeps failing is
        # quarantined after max_attempts instead of burning full inference
        # on known-bad input every poll forever
        self._attempts: Dict[str, int] = {}
        # 'failed' counts DISTINCT failing cases; 'skipped' counts cases
        # currently quarantined
        self.stats = {"done": 0, "failed": 0, "skipped": 0, "waiting": 0}
        # --profile DIR: one-shot jax.profiler trace of the first
        # config.profile_steps cases served (the serving twin of the
        # trainer's step-window trace). start_step=0 — unlike training,
        # a serve run may only ever see one case, so the window must
        # include it even though case 0 carries the compile; per-case
        # annotate() spans keep the timeline readable either way.
        self._tracer = StepTraceController(
            config.profile_dir, start_step=0, n_steps=config.profile_steps
        )
        self._cases_seen = 0

    # -- discovery -------------------------------------------------------------

    def _is_case_dir(self, path: str) -> bool:
        if not os.path.isdir(path):
            return False
        return any(
            _find_volume_file(os.path.join(path, m))
            for m in self.config.modalities
        )

    def _is_ready(self, path: str) -> bool:
        """The case dir has been quiescent for ``min_age`` seconds.

        Guards against serving a case that is still being copied in: with
        ``missing_strategy='zero_fill'`` a half-uploaded case would get a
        silently degraded segmentation and the output marker would prevent
        any retry once the rest arrived. Two deliberate choices:
          * age = now − max(st_mtime, st_ctime): tar/rsync -a/cp -p
            preserve mtimes (often days old), but ctime is stamped at
            local file creation and cannot be back-dated — without it a
            half-untarred case would look instantly quiescent;
          * completeness does NOT short-circuit the window: the final
            modality's file exists the moment its copy *starts*, so an
            all-present case can still be mid-copy.
        ``min_age <= 0`` disables the guard (everything is ready).
        """
        if self.min_age <= 0:
            return True
        newest = 0.0
        for base, _, files in os.walk(path):
            for f in files:
                try:
                    st = os.stat(os.path.join(base, f))
                    newest = max(newest, st.st_mtime, st.st_ctime)
                except OSError:
                    pass
        return newest > 0 and (time.time() - newest) >= self.min_age

    def _output_path(self, case_id: str) -> str:
        return os.path.join(self.output_dir, case_id, self.output_name)

    def pending_cases(self) -> List[str]:
        """Unprocessed, ready case ids under input_root (sorted).

        Side effect: ``stats['waiting']`` is set to the number of cases
        currently held back by the quiescence window, so batch callers can
        see that a scan left work behind.
        """
        if not os.path.isdir(self.input_root):
            return []
        out = []
        waiting = 0
        quarantined = 0
        for name in sorted(os.listdir(self.input_root)):
            case_dir = os.path.join(self.input_root, name)
            if not self._is_case_dir(case_dir):
                continue
            if os.path.exists(self._output_path(name)):
                continue
            if self._attempts.get(name, 0) >= self.max_attempts:
                quarantined += 1
                continue
            if not self._is_ready(case_dir):
                waiting += 1
                self.log.info(
                    "case %s not quiescent yet; waiting (min_age=%.0fs)",
                    name,
                    self.min_age,
                )
                continue
            out.append(name)
        self.stats["waiting"] = waiting
        self.stats["skipped"] = quarantined
        return out

    # -- serving ---------------------------------------------------------------

    def _load(self, case_id: str):
        """Host-side decode+resample of one case (thread-safe, no device).

        With ``config.device_ingest`` only the raw per-modality arrays
        are produced here; normalize+cast+stack run on the chip from the
        serving thread (predict.py::_device_ingest_stack) — the host
        share of each case drops to zlib decode + resample."""
        cfg = self.config
        if getattr(cfg, "device_ingest", False):
            from pcmseg_tpu.infer.predict import load_multimodal_raw

            return load_multimodal_raw(
                os.path.join(self.input_root, case_id),
                modalities=cfg.modalities,
                handle_missing=cfg.missing_strategy,
                coregister=getattr(cfg, "coregister", False),
            )
        from pcmseg_tpu.infer.predict import load_multimodal_images

        return load_multimodal_images(
            os.path.join(self.input_root, case_id),
            modalities=cfg.modalities,
            handle_missing=cfg.missing_strategy,
            normalize=cfg.normalize,
            norm_percentiles=cfg.norm_percentiles,
            out_dtype=self.predictor.wire_dtype,
            coregister=getattr(cfg, "coregister", False),
        )

    def process_case(self, case_id: str, preloaded=None) -> Optional[str]:
        """Segment one case. ``preloaded`` may be a concurrent Future from
        ``_load`` (the pipeline path) — its exception, if any, surfaces
        here and is counted against this case only."""
        t0 = time.perf_counter()
        self._tracer.on_step(self._cases_seen)
        self._cases_seen += 1
        try:
            if preloaded is not None:
                image, reference = preloaded.result()
            else:
                image, reference = self._load(case_id)
            if getattr(self.config, "device_ingest", False):
                # `image` is the raw per-modality channel list; the
                # normalize+cast+stack program runs on device here (the
                # serving thread), overlapped with the NEXT case's host
                # decode by the pipeline above
                image = self.predictor._device_ingest_stack(image)
            with annotate(f"case:{case_id}"):
                # threshold on device: the serve loop only writes masks,
                # so fetch 6 MB uint8 instead of 24 MB fp32 probabilities
                mask = self.predictor.predict_mask(image)
                out = self.predictor.save_mask(
                    mask, reference, self._output_path(case_id)
                )
        except Exception as e:  # one bad case must not kill the server
            first_failure = case_id not in self._attempts
            self._attempts[case_id] = self._attempts.get(case_id, 0) + 1
            if first_failure:
                self.stats["failed"] += 1  # distinct failing cases
            if self._attempts[case_id] >= self.max_attempts:
                self.log.error(
                    "case %s failed %d times; quarantined: %s",
                    case_id, self._attempts[case_id], e,
                )
            else:
                self.log.error("case %s failed: %s", case_id, e)
            return None
        self._attempts.pop(case_id, None)
        self.stats["done"] += 1
        self.log.info(
            "case %s → %s (%.2fs)", case_id, out, time.perf_counter() - t0
        )
        return out

    def close(self) -> None:
        """Flush the one-shot profiler trace if it is still open (runs
        shorter than the trace window). Idempotent; callers should invoke
        on every exit path."""
        self._tracer.close()

    def run_once(self) -> Dict[str, int]:
        """Segment every pending case once; returns the running stats.

        The NEXT case's host decode overlaps the current case's device
        compute (one-ahead prefetch thread) — the same host/device overlap
        the training loader uses.
        """
        from concurrent.futures import ThreadPoolExecutor

        cases = self.pending_cases()
        if not cases:
            return dict(self.stats)
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(self._load, cases[0])
            for i, case_id in enumerate(cases):
                nxt = (
                    pool.submit(self._load, cases[i + 1])
                    if i + 1 < len(cases)
                    else None
                )
                self.process_case(case_id, preloaded=fut)
                fut = nxt
        return dict(self.stats)

    def run(
        self,
        poll_interval: float = 5.0,
        max_polls: Optional[int] = None,
        stop_file: Optional[str] = None,
    ) -> Dict[str, int]:
        """Watch input_root until stopped.

        Stops when ``stop_file`` appears (operational kill switch) or after
        ``max_polls`` polling rounds (bounded runs / tests); otherwise loops
        forever on KeyboardInterrupt-able sleep.
        """
        polls = 0
        self.log.info(
            "serving %s → %s (poll %.1fs)",
            self.input_root,
            self.output_dir,
            poll_interval,
        )
        while True:
            self.run_once()
            polls += 1
            if stop_file and os.path.exists(stop_file):
                self.log.info("stop file %s present; exiting", stop_file)
                break
            if max_polls is not None and polls >= max_polls:
                break
            try:
                time.sleep(poll_interval)
            except KeyboardInterrupt:
                self.log.info("interrupted; exiting")
                break
        self.close()
        return dict(self.stats)
