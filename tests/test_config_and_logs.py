"""Config snapshot/override semantics + CSV backfill + LogWriter."""

import csv
import os

import numpy as np
import pytest

from voxactb_tpu.agents.base import ScalarSummary
from voxactb_tpu.config import Config
from voxactb_tpu.utils.loggers import CsvWriter, LogWriter


def test_config_override_and_snapshot_roundtrip(tmp_path):
    cfg = Config().override(**{
        "method.which_arm": "dominant",
        "method.crop_radius": 0.3,
        "method.voxel_sizes": [50],
        "rlbench.tasks": ["open_jar", "open_drawer"],
        "framework.eval_type": "best",
        "seed": 7,
    })
    p = str(tmp_path / "config.json")
    cfg.save(p)
    back = Config.load(p)
    assert back.method.which_arm == "dominant"
    assert back.method.crop_radius == 0.3
    assert back.method.voxel_size == 50
    assert back.rlbench.tasks == ["open_jar", "open_drawer"]
    assert back.framework.eval_type == "best"
    assert back.seed == 7
    # overrides on the reloaded snapshot still validate keys
    with pytest.raises(KeyError, match="unknown config key"):
        back.override(**{"method.not_a_knob": 1})


def test_config_override_does_not_mutate_original():
    cfg = Config()
    cfg2 = cfg.override(**{"method.lr": 1e-4})
    assert cfg.method.lr == 0.0005 and cfg2.method.lr == 1e-4
    assert cfg2.method is not cfg.method or cfg.method.lr == 1e-4  # replaced tree


def test_csv_writer_backfills_new_columns(tmp_path):
    p = str(tmp_path / "m.csv")
    w = CsvWriter(p)
    w.write({"step": 0, "loss": 1.0})
    w.write({"step": 1, "loss": 0.5, "grad_norm": 3.0})  # new column appears
    with open(p) as f:
        rows = list(csv.DictReader(f))
    assert rows[0]["grad_norm"] == ""  # backfilled
    assert rows[1]["grad_norm"] == "3.0"
    assert [r["step"] for r in rows] == ["0", "1"]


def test_csv_writer_resume_preserves_prior_rows(tmp_path):
    """A fresh CsvWriter on an existing file must append, not truncate — the
    'missing' eval sweep and train resume depend on previously scored rows
    surviving a process restart (peract/eval.py:148-152)."""
    p = str(tmp_path / "m.csv")
    w = CsvWriter(p)
    w.write({"step": 0, "eval_envs/return": 80.0})
    w.write({"step": 1000, "eval_envs/return": 90.0})
    del w

    w2 = CsvWriter(p)  # simulates the restarted process
    w2.write({"step": 2000, "eval_envs/return": 95.0})
    # a NEW column forces the _rewrite path, which must keep the loaded rows
    w2.write({"step": 3000, "eval_envs/return": 85.0, "extra": 1.0})
    with open(p) as f:
        rows = list(csv.DictReader(f))
    assert [r["step"] for r in rows] == ["0", "1000", "2000", "3000"]
    assert rows[0]["eval_envs/return"] == "80.0"
    assert rows[0]["extra"] == ""


def test_csv_writer_truncate_from_drops_post_checkpoint_rows(tmp_path):
    """Train resume restarts from the last checkpoint; rows logged after it by
    the interrupted leg must be dropped so the CSV holds one run's trajectory
    (the advisor's artifact-mixing finding on the r4d hand_over_item leg)."""
    p = str(tmp_path / "t.csv")
    w = CsvWriter(p)
    for s in (0, 100, 200, 300):
        w.write({"step": s, "loss": float(s)})
    del w

    w2 = CsvWriter(p)  # restarted process resuming from the step-200 ckpt
    w2.truncate_from(201)
    w2.write({"step": 300, "loss": -1.0})
    with open(p) as f:
        rows = list(csv.DictReader(f))
    assert [r["step"] for r in rows] == ["0", "100", "200", "300"]
    assert rows[-1]["loss"] == "-1.0"  # the resumed leg's row, not the stale one


def test_log_writer_writes_scalars(tmp_path):
    lw = LogWriter(str(tmp_path), tensorboard_logging=False)
    lw.add_summaries(5, [ScalarSummary("losses/total", 2.5),
                         ScalarSummary("losses/rot", np.float32(1.25))])
    lw.close()
    with open(tmp_path / "train_data.csv") as f:
        rows = list(csv.DictReader(f))
    assert rows[0]["losses/total"] == "2.5"
    assert float(rows[0]["losses/rot"]) == 1.25


def test_eval_return_semantics_match_reference():
    """`eval_envs/return` is mean episode return where success pays exactly
    REWARD_SCALE=100 at episode end (launch_utils.py:32,
    stat_accumulator.py:91-113): mean return == 100 * success_rate."""
    from voxactb_tpu.data.fill_replay import REWARD_SCALE
    from voxactb_tpu.utils.loggers import StatAccumulator

    assert REWARD_SCALE == 100.0
    acc = StatAccumulator()
    # 3 successes, 1 failure -> success rate 0.75 -> mean return 75
    for success in (True, True, True, False):
        acc.step_episode(REWARD_SCALE if success else 0.0, length=5)
    stats = {s.name: s.value for s in acc.pop()}
    assert stats["eval_envs/return"] == 75.0
    assert stats["eval_envs/length"] == 5.0
    assert stats["eval_envs/episodes"] == 4.0
    # the accumulator drains on pop (fresh window per checkpoint)
    assert acc.pop() == []
