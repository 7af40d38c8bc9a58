"""Config hot-reload (otelcol/collector.go:191-204 Watch → rebuild):
a long-running tail service picks up a changed YAML between ticks —
new work flows through the new stage chain, completed partitions stay
completed (checkpoint ledger intact), and a broken mid-run edit keeps
the previous good config instead of killing the loop."""

import os
import shutil

import pytest
import ray.data

from opentelemetry_collector_ray.fixtures import write_transcript_corpus
from opentelemetry_collector_ray.pipelines.config import ConfigError
from opentelemetry_collector_ray.state.tailer import ConfigWatcher, tail_run


def _write_cfg(path: str, tag: str) -> None:
    # a full valid pipeline spec; sinks are owned by tail_run's
    # partitioned writer, so out_dir here is nominal
    with open(path + ".tmp", "w") as f:
        f.write(
            f"""pipeline:
  source:
    type: parquet
    paths: ["unused"]
  stages:
    - type: transform
      statements: ["set(tag, '{tag}')"]
  sinks:
    mode: single
    out_dir: /tmp/unused
"""
        )
    os.rename(path + ".tmp", path)
    # mtime_ns granularity is fine, but ensure it moves even on fast fs
    os.utime(path, ns=(os.stat(path).st_mtime_ns + 1,) * 2)


def test_reload_applies_to_next_tick_with_ledger_intact(
    ray_session, tmp_path
):
    src = str(tmp_path / "src")
    wave1 = str(tmp_path / "wave1")
    write_transcript_corpus(wave1, 40, files=3)
    os.makedirs(src)
    for f in sorted(os.listdir(wave1))[:3]:
        shutil.copy(os.path.join(wave1, f), os.path.join(src, f))

    cfg_path = str(tmp_path / "pipe.yaml")
    _write_cfg(cfg_path, "v1")
    watcher = ConfigWatcher(cfg_path)
    assert watcher.generation == 1

    stop = str(tmp_path / "STOP")
    # wave 2 = the LAST shard of a larger corpus, so its conv ids are
    # disjoint from wave 1's (the fixture numbers convs from 0)
    stage2 = str(tmp_path / "stage2")
    write_transcript_corpus(stage2, 50, files=5)
    wave2_file = sorted(os.listdir(stage2))[-1]
    wave2 = os.path.join(stage2, wave2_file)
    state = {"tick": 0}

    def fake_sleep(_):
        state["tick"] += 1
        if state["tick"] == 1:
            # mid-run: flip the stage parameter AND land new input
            _write_cfg(cfg_path, "v2")
            shutil.copy(wave2, os.path.join(src, "zz-" + wave2_file))
            open(stop, "w").write("")

    out = str(tmp_path / "out")
    stats = tail_run(
        src + "/*.parquet",
        out,
        watcher,
        num_partitions=4,
        poll_interval=0.01,
        stop_file=stop,
        sleep=fake_sleep,
    )
    assert stats["ticks"] == 2
    assert watcher.generation == 2  # the reload happened
    import glob as _g
    df = ray.data.read_parquet(sorted(_g.glob(out + "/part-*/*.parquet"))).to_pandas()
    tags = set(df["tag"])
    # next tick's (re)processed partitions carry v2; untouched
    # completed partitions keep v1 — the config flip alone did NOT
    # reprocess ledger-complete partitions (deterministic file→
    # partition hashing makes this split stable)
    assert tags == {"v1", "v2"}
    # every wave-2 row went through the NEW chain
    wave2_convs = set(
        ray.data.read_parquet(wave2).to_pandas()["conv_id"]
    )
    got2 = df[df["conv_id"].isin(wave2_convs)]
    assert len(got2) and set(got2["tag"]) == {"v2"}
    # tick 2 reprocessed only partitions whose input changed: strictly
    # fewer partition runs than two full sweeps
    assert stats["processed"] < 2 * 4


def test_bad_reload_keeps_previous_config(tmp_path):
    cfg_path = str(tmp_path / "pipe.yaml")
    _write_cfg(cfg_path, "v1")
    watcher = ConfigWatcher(cfg_path)
    good = watcher.cfg
    with open(cfg_path, "w") as f:
        f.write("pipeline:\n  stages: []\n")  # no source/sinks → invalid
    os.utime(cfg_path, ns=(os.stat(cfg_path).st_mtime_ns + 1,) * 2)
    assert watcher.refresh() is False
    assert watcher.cfg is good and watcher.generation == 1
    # and a bad INITIAL config is fatal
    with pytest.raises(ConfigError):
        ConfigWatcher(cfg_path)
    # a subsequent good edit recovers
    _write_cfg(cfg_path, "v3")
    assert watcher.refresh() is True
    assert watcher.generation == 2


def test_tail_cli_in_process(ray_session, tmp_path, capsys):
    """The `tail` CLI command end-to-end: YAML chain over a glob with
    ledger + telemetry, run through main() under the existing Ray
    session (the _ray_session guard)."""
    import json

    from opentelemetry_collector_ray.__main__ import main
    from opentelemetry_collector_ray.fixtures import write_transcript_corpus

    src = str(tmp_path / "src")
    write_transcript_corpus(src, 20, files=2)
    cfg = str(tmp_path / "pipe.yaml")
    _write_cfg(cfg, "cli")
    rc = main(
        [
            "tail",
            cfg,
            "--inputs",
            src + "/*.parquet",
            "--out",
            str(tmp_path / "out"),
            "--max-ticks",
            "1",
            "-p",
            "2",
            "--telemetry-out",
            str(tmp_path / "tel"),
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["ticks"] == 1 and report["config_generation"] == 1
    assert report["total_rows"] > 0
    assert os.listdir(str(tmp_path / "tel"))
    # invalid config → clean failure
    bad = str(tmp_path / "bad.yaml")
    open(bad, "w").write("pipeline:\n  stages: []\n")
    assert main(["tail", bad, "--inputs", "x", "--out", "y"]) == 1


def test_reload_survives_unparsable_yaml_and_missing_file(tmp_path):
    """A half-saved edit (unparsable YAML) or an editor's transient
    unlink must not kill the tail service (review finding, r4)."""
    cfg_path = str(tmp_path / "pipe.yaml")
    _write_cfg(cfg_path, "v1")
    watcher = ConfigWatcher(cfg_path)
    open(cfg_path, "w").write("pipeline: [\n")  # not even YAML
    os.utime(cfg_path, ns=(os.stat(cfg_path).st_mtime_ns + 1,) * 2)
    assert watcher.refresh() is False and watcher.generation == 1
    os.unlink(cfg_path)  # transiently missing
    assert watcher.refresh() is False and watcher.generation == 1
    _write_cfg(cfg_path, "v2")  # save completes
    assert watcher.refresh() is True and watcher.generation == 2
