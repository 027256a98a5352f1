import glob
import json
import os

from osmray import synth


def test_cli_label_and_resume(ray_session, fixture_dir, tmp_path, capsys):
    from osmray.__main__ import main

    bbox = ",".join(str(v) for v in synth.fixture_bbox(fixture_dir))
    out = str(tmp_path / "cli_out")
    args = [
        "label",
        "--images", os.path.join(fixture_dir, "images", "*.parquet"),
        "--features", os.path.join(fixture_dir, "features.parquet"),
        "--bbox", bbox,
        "--limit", "40",
        "--out", out,
    ]
    assert main(args) == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s1["rows_out"] > 0 and s1["skipped"] == 0
    # resume: everything skipped, same rows
    assert main(args) == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["skipped"] == s2["partitions"] and s2["rows_out"] == s1["rows_out"]


def test_cli_bad_glob(ray_session, capsys):
    from osmray.__main__ import main

    rc = main(
        ["label", "--images", "/nope/*.parquet", "--features", "/x", "--bbox",
         "0,0,1,1", "--out", "/tmp/never"]
    )
    assert rc == 2
