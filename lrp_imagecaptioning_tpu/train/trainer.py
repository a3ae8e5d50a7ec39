"""Training orchestration, the equivalent of the reference ``Training``
classes (train.py:12-400): wires config -> dataset provider -> model ->
optimizer -> epoch loop with per-epoch caption-metric evaluation,
plateau LR schedule, CSV logging, checkpointing, and stop conditions.

Differences by design (TPU-first):
* the inner loop is one donated jitted step (make_train_step), optionally
  sharded over a device mesh (data-parallel; make_sharded_train_step);
* the per-epoch greedy-decode evaluation (LogMetrics, callbacks.py:37-70)
  uses the O(T) scan decoder instead of re-running the teacher-forcing graph
  per word;
* checkpoints are Orbax (params + opt state), not HDF5 weight dumps.
"""

from __future__ import annotations

import os
import time
from datetime import timedelta
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..infer.api import BasicInference
from ..models.captioner import build_captioner
from .callbacks import CSVLog, ReduceLROnPlateau, StopAfterTimedelta, StopWhenValLossExploding
from .checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
from .optimizer import get_learning_rate, make_optimizer, set_learning_rate
from .step import (
    make_eval_step,
    metric_accumulator,
    make_multi_train_step,
    make_sharded_multi_train_step,
    make_sharded_train_step,
    make_train_step,
    run_stepped_steps,
)


_TIME_UNITS = ("seconds", "minutes", "hours", "days", "weeks")


def parse_timedelta(s: Optional[str]) -> Optional[timedelta]:
    """'12 hours' / '30 minutes' / '1 day' (the reference passes
    dateutil-style strings, train.py:29)."""
    if not s:
        return None
    parts = s.split()
    if len(parts) != 2:
        raise ValueError(
            f"time_limit must be '<number> <unit>' (e.g. '12 hours'), got {s!r}")
    unit = parts[1].rstrip("s") + "s"
    if unit not in _TIME_UNITS:
        raise ValueError(
            f"time_limit unit must be one of {_TIME_UNITS}, got {parts[1]!r}")
    return timedelta(**{unit: float(parts[0])})


class Trainer:
    """main_attention() equivalent (train.py:676-682): pick model by type,
    train with the reference's schedule semantics."""

    def __init__(self, model_type: str, config, dataset, label: str = "run",
                 mesh=None, seed: int = 0, eval_metrics: bool = True,
                 multihost: bool = False, steps_per_call: int = 1):
        self.model_type = model_type
        self.config = config
        self.dataset = dataset
        self.label = label
        self.mesh = mesh
        # multihost: this process's provider yields only its shard of the
        # global batch (parallel/distributed.py::process_batch_slice); batches
        # are assembled into global arrays with no cross-host gather.
        # Single-process this is bit-identical to the plain path.
        if multihost and mesh is None:
            # silently degrading to single-host placement would train each
            # process on its own data fraction with no gradient sync
            raise ValueError("multihost=True requires a mesh (make_multihost_mesh)")
        self._multihost = multihost and mesh is not None
        self._eval_metrics = eval_metrics

        from ..data.provider import DatasetProvider

        self.provider = DatasetProvider(dataset, config)
        self.captioner = build_captioner(model_type, config, self.provider.vocab_size)
        self.optimizer = make_optimizer(model_type, config.learning_rate)

        key = jax.random.PRNGKey(seed)
        self._rng, init_key = jax.random.split(key)
        vocab_words = None
        if config.pretrained_word_vector:
            # vocabs[i] is the word for model id i (1-based token i+1)
            vocab_words = self.provider.vocabs
        self.params = self.captioner.init_params(
            init_key, vocab_words=vocab_words,
            word_vector_path=getattr(config, "word_vector_path", None),
        )
        self.opt_state = self.optimizer.init(self.params)

        # steps_per_call > 1: scan K batches per dispatch — amortizes the
        # host->device dispatch round trip, which dominates chained single
        # steps on relay-attached TPUs (make_multi_train_step docstring has
        # the measurements). Ragged epoch tails fall back to single steps.
        # Composes with a mesh (make_sharded_multi_train_step) and with
        # multihost=True (each process stacks its K local batches;
        # global_stacked_batch_from_local assembles the (K, B_global, ...)
        # arrays with no cross-host gather).
        self._steps_per_call = max(int(steps_per_call), 1)
        if mesh is not None:
            data_size = mesh.shape.get("data", 1)
            if config.batch_size % data_size:
                # fail at construction, not at the first sharded dispatch:
                # in_shardings rejects batch dims not divisible by the data axis
                raise ValueError(
                    f"batch_size {config.batch_size} not divisible by the "
                    f"mesh data-axis size {data_size}")
            self._train_step, place = make_sharded_train_step(
                self.captioner, self.optimizer, mesh, params_template=self.params,
                opt_state_template=self.opt_state,
            )
            self._multi_step = None
            if self._steps_per_call > 1:
                self._multi_step, _ = make_sharded_multi_train_step(
                    self.captioner, self.optimizer, mesh, params_template=self.params,
                    opt_state_template=self.opt_state,
                )
            self.params, self.opt_state = place(self.params, self.opt_state)
        else:
            self._train_step = make_train_step(self.captioner, self.optimizer)
            self._multi_step = (
                make_multi_train_step(self.captioner, self.optimizer)
                if self._steps_per_call > 1 else None
            )
        self._eval_step = make_eval_step(self.captioner)

        self.result_dir = os.path.join(
            "results", dataset.dataset_name if hasattr(dataset, "dataset_name") else config.dataset_name,
            "training-results", label,
        )
        os.makedirs(self.result_dir, exist_ok=True)
        self._initial_epoch = 0  # advanced by resume_latest()

    def _place(self, arr):
        if self._multihost:
            from ..parallel.distributed import global_batch_from_local

            return global_batch_from_local(self.mesh, arr)
        if self.mesh is not None:
            from ..parallel import batch_sharding

            data_size = self.mesh.shape.get("data", 1)
            if arr.shape[0] % data_size == 0:
                return jax.device_put(arr, batch_sharding(self.mesh))
            # ragged batch (e.g. a small validation tail): leave uncommitted;
            # jitted steps with in_shardings reshard what they need
        return jnp.asarray(arr)

    def _place_stacked(self, arr):
        """(K, B, ...) stacks: shard the batch axis (axis 1) over data."""
        if self._multihost:
            from ..parallel.distributed import global_stacked_batch_from_local

            return global_stacked_batch_from_local(self.mesh, arr)
        if self.mesh is not None:
            from ..parallel import stacked_batch_sharding

            return jax.device_put(arr, stacked_batch_sharding(self.mesh))
        return jnp.asarray(arr)

    # -- weights -----------------------------------------------------------

    def load_weights(self, path: str):
        from .checkpoint import load_params_npz

        if path.endswith(".npz"):
            self.params = load_params_npz(path)
        else:
            self.params, opt = restore_checkpoint(path, self.params, self.opt_state)
            if opt is not None:
                self.opt_state = opt
        return self

    def resume_latest(self) -> bool:
        """Restore the newest checkpoint AND its epoch number, so a resumed
        ``run()`` continues the epoch numbering (checkpoints after resume
        would otherwise restart at ckpt_00 and rank BELOW the stale
        pre-resume checkpoint in ``latest_checkpoint``) and appends to the
        existing metrics CSV instead of truncating it."""
        import re

        ckpt = latest_checkpoint(self.result_dir)
        if ckpt is None:
            return False
        self.load_weights(ckpt)
        m = re.match(r"ckpt_(\d+)", os.path.basename(ckpt))
        if m:
            self._initial_epoch = int(m.group(1)) + 1
        return True

    # -- loop --------------------------------------------------------------

    def _split_rng(self, n: int):
        self._rng, sub = jax.random.split(self._rng)
        return jax.random.split(sub, n)

    def _epoch(self, generator, steps: int, training: bool):
        # metrics stay device-side until the epoch ends — a float() per step
        # would force a host sync per step
        record, finalize = metric_accumulator()

        if training:
            K = self._steps_per_call if self._multi_step is not None else 1
            self.params, self.opt_state = run_stepped_steps(
                generator, steps, K, self._place, self._split_rng,
                self._multi_step, self._train_step, self.params, self.opt_state,
                record, place_stacked=self._place_stacked,
            )
        else:
            for _ in range(steps):
                (cap_in, imgs), y = next(generator)
                record(self._eval_step(self.params, self._place(imgs),
                                       self._place(cap_in), self._place(y)))
        return finalize(steps)

    def run(self, epochs: Optional[int] = None, time_limit: Optional[str] = None,
            steps_per_epoch: Optional[int] = None, log_prefix: str = "") -> list[dict]:
        """Train; returns the per-epoch logs list. Either epochs or the
        config/time-limit must bound the run (train.py:46-48)."""
        cfg = self.config
        epochs = epochs if epochs is not None else cfg.epochs
        tl = parse_timedelta(time_limit or cfg.time_limit)
        if epochs is None and tl is None:
            raise ValueError("need epochs or time_limit (reference enforces XOR, train.py:46-48)")

        T = cfg.sentence_length + 1  # provider pads captions to T+1 (SOS..EOS)
        from ..data.prefetch import prefetch

        # background producer overlaps image decode with device compute
        # (GeneratorEnqueuer equivalent, inference.py:63-92). Mesh runs drop
        # the ragged epoch-tail batch: the sharded train step's in_shardings
        # REJECTS batch dims not divisible by the data axis (the generator is
        # infinite, so the epoch just rolls into the next pass). Validation
        # tails are fine — the eval step is a plain jit.
        train_gen = prefetch(self.provider.training_set(
            pad_to_length=T, drop_remainder=(self.mesh is not None)))
        val_gen = prefetch(self.provider.validation_set(pad_to_length=T))
        # resumed runs append to the existing CSV history rather than wiping it
        csv_log = CSVLog(os.path.join(self.result_dir, "metrics-log.csv"),
                         append=self._initial_epoch > 0)
        plateau = ReduceLROnPlateau(
            monitor="val_cider", factor=cfg.reduce_lr_factor, patience=cfg.reduce_lr_patience
        )
        time_stop = StopAfterTimedelta(tl)
        explode_stop = StopWhenValLossExploding()

        # built ONCE: a fresh BasicInference per epoch would re-jit (and so
        # re-compile) the greedy-decode scan every epoch; params are updated
        # on the instance before each eval instead
        inference = BasicInference(
            self.captioner, self.params, self.provider,
            max_caption_length=cfg.sentence_length,
        ) if self._eval_metrics else None

        history = []
        # resumed runs continue the numbering (Keras initial_epoch semantics:
        # `epochs` is the TOTAL target, so epochs <= initial_epoch runs none)
        epoch = self._initial_epoch
        try:
            self._run_epochs(epochs, steps_per_epoch, epoch, train_gen, val_gen,
                             inference, plateau, time_stop, explode_stop,
                             csv_log, history, log_prefix)
        finally:
            # stop the producer threads even when an epoch raises — each
            # abandoned PrefetchingGenerator busy-polls forever while pinning
            # its queue of decoded image batches
            train_gen.stop()
            val_gen.stop()
        csv_log.close()
        cfg.save_yaml(os.path.join(self.result_dir, "config.yaml"))
        return history

    def _run_epochs(self, epochs, steps_per_epoch, epoch, train_gen, val_gen,
                    inference, plateau, time_stop, explode_stop, csv_log,
                    history, log_prefix):
        while epochs is None or epoch < epochs:
            ts_start = time.time()
            steps = steps_per_epoch or self.provider.training_steps
            logs = self._epoch(train_gen, steps, training=True)
            val = self._epoch(val_gen, self.provider.validation_steps, training=False)
            logs.update({f"val_{k}": v for k, v in val.items()})

            if inference is not None:
                # LogMetrics: full caption-metric eval on the test split each
                # epoch; these drive the LR schedule + ckpt names
                # (callbacks.py:37-70, train.py:276-277)
                inference.params = self.params
                metrics = inference.evaluate_test_set()
                logs.update({f"val_{k.lower()}": v for k, v in metrics.items()})

            lr = get_learning_rate(self.opt_state)
            new_lr = plateau.update(logs, lr)
            if new_lr != lr:
                self.opt_state = set_learning_rate(self.opt_state, new_lr)
            logs["learning_rate"] = new_lr
            logs["ts_start"], logs["ts_end"] = ts_start, time.time()
            # host/device memory like LogMetrics' psutil dump (callbacks.py:56-67)
            from ..utils.profiling import memory_stats

            logs.update(memory_stats())

            save_checkpoint(
                self.result_dir, epoch, self.params, self.opt_state,
                metric=logs.get("val_cider"),
            )
            csv_log.on_epoch_end(epoch, logs)
            history.append(logs)
            print(f"{log_prefix}epoch {epoch}: " + " ".join(f"{k}={v:.4f}" for k, v in logs.items() if isinstance(v, float)))

            epoch += 1
            if time_stop.should_stop() or explode_stop.should_stop(logs.get("val_loss")):
                break


MODELTYPE = ("adaptiveattention", "gridTD", "aoa")


def main_attention(config, dataset, label: str, model_type: str, weights: str | None = None, **run_kw):
    """Reference entry point parity (train.py:679-682)."""
    if model_type not in MODELTYPE:
        raise ValueError(f"model_type must be one of {MODELTYPE}")
    t = Trainer(model_type, config, dataset, label)
    if weights:
        t.load_weights(weights)
    t.run(**run_kw)
    return t
