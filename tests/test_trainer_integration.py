"""End-to-end Trainer integration on the synthetic dataset: epoch loop,
per-epoch caption-metric eval, plateau LR, CSV log, Orbax checkpoints,
resume."""

import os

import numpy as np
import pytest

from lrp_imagecaptioning_tpu.config import FlickrConfig
from lrp_imagecaptioning_tpu.data.datasets import SyntheticDataset
from lrp_imagecaptioning_tpu.train.trainer import Trainer, parse_timedelta


def test_parse_timedelta():
    assert parse_timedelta("12 hours").total_seconds() == 12 * 3600
    assert parse_timedelta("30 minutes").total_seconds() == 1800
    assert parse_timedelta(None) is None
    # malformed strings raise with the expected format, not IndexError
    with pytest.raises(ValueError, match="number.*unit"):
        parse_timedelta("12h")
    with pytest.raises(ValueError, match="unit"):
        parse_timedelta("2 fortnights")


def test_csvlog_append(tmp_path):
    """Resumed runs append to the metrics CSV instead of truncating it."""
    import csv

    from lrp_imagecaptioning_tpu.train.callbacks import CSVLog

    path = str(tmp_path / "m.csv")
    log = CSVLog(path)
    log.on_epoch_end(0, {"loss": 1.0})
    log.on_epoch_end(1, {"loss": 0.5})
    log.close()

    resumed = CSVLog(path, append=True)
    resumed.on_epoch_end(2, {"loss": 0.25, "extra": 9})  # extra col ignored
    resumed.close()

    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    assert [r["epoch"] for r in rows] == ["0", "1", "2"]
    assert rows[2]["loss"] == "0.25"


@pytest.mark.slow
def test_trainer_two_epochs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = FlickrConfig(
        embedding_dim=16, hidden_dim=16, sentence_length=6, drop_rate=0.0,
        batch_size=4, rare_words_handling="nothing", learning_rate=1e-3,
    )
    ds = SyntheticDataset(cfg, n_train=8, n_val=4, n_test=4,
                          cache_dir=str(tmp_path / "imgs"))
    trainer = Trainer("adaptiveattention", cfg, ds, label="itest")
    history = trainer.run(epochs=2, steps_per_epoch=2)

    assert len(history) == 2
    for logs in history:
        assert np.isfinite(logs["loss"])
        assert "val_loss" in logs and "val_cider" in logs
        assert "learning_rate" in logs
    # artifacts: CSV log, config snapshot, checkpoints
    assert os.path.exists(os.path.join(trainer.result_dir, "metrics-log.csv"))
    assert os.path.exists(os.path.join(trainer.result_dir, "config.yaml"))
    from lrp_imagecaptioning_tpu.train.checkpoint import latest_checkpoint

    assert latest_checkpoint(trainer.result_dir) is not None

    # resume restores the latest checkpoint AND continues epoch numbering
    # (post-resume checkpoints must outrank the pre-resume ones)
    t2 = Trainer("adaptiveattention", cfg, ds, label="itest")
    assert t2.resume_latest()
    assert t2._initial_epoch == 2
    # Keras initial_epoch semantics: `epochs` is the total target
    assert t2.run(epochs=2) == []


@pytest.mark.slow
def test_trainer_with_mesh(tmp_path, monkeypatch):
    """Trainer wired to a device mesh: sharded steps, checkpoints, logs."""
    monkeypatch.chdir(tmp_path)
    from lrp_imagecaptioning_tpu.parallel import make_mesh

    cfg = FlickrConfig(
        embedding_dim=16, hidden_dim=16, sentence_length=6, drop_rate=0.0,
        batch_size=8, rare_words_handling="nothing", learning_rate=1e-3,
    )
    ds = SyntheticDataset(cfg, n_train=8, n_val=8, n_test=8,
                          cache_dir=str(tmp_path / "imgs"))
    mesh = make_mesh(8)
    trainer = Trainer("adaptiveattention", cfg, ds, label="mesh-itest",
                      mesh=mesh, eval_metrics=False)
    history = trainer.run(epochs=1, steps_per_epoch=1)
    assert len(history) == 1
    assert np.isfinite(history[0]["loss"])
    assert np.isfinite(history[0]["val_loss"])


@pytest.mark.slow
def test_trainer_multihost_degenerate_matches_plain_mesh(tmp_path, monkeypatch):
    """multihost=True in a single process must be bit-identical to the plain
    mesh path (the local shard IS the global batch)."""
    monkeypatch.chdir(tmp_path)
    from lrp_imagecaptioning_tpu.parallel import make_mesh

    cfg = FlickrConfig(
        embedding_dim=16, hidden_dim=16, sentence_length=6, drop_rate=0.0,
        batch_size=8, rare_words_handling="nothing", learning_rate=1e-3,
    )
    ds = SyntheticDataset(cfg, n_train=8, n_val=8, n_test=8,
                          cache_dir=str(tmp_path / "imgs"))
    mesh = make_mesh(8)
    hists = []
    for mh in (False, True):
        trainer = Trainer("adaptiveattention", cfg, ds, label=f"mh-{mh}",
                          mesh=mesh, eval_metrics=False, multihost=mh)
        hists.append(trainer.run(epochs=1, steps_per_epoch=2))
    # train goes through the sharded step's in_shardings in both modes ->
    # bit-identical; eval runs unsharded vs data-sharded -> reduction-order
    # float noise only
    assert hists[0][0]["loss"] == hists[1][0]["loss"]
    np.testing.assert_allclose(hists[0][0]["val_loss"], hists[1][0]["val_loss"], rtol=1e-5)
