# -*- coding: utf-8 -*-
"""Lineage (kill-and-resume) and report-rendering tests."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from osmlint import lineage, pipeline, report


def _all_flags(out_dir):
    parts = sorted(d for d in os.listdir(out_dir) if d.startswith("part="))
    dfs = [pq.read_table(os.path.join(out_dir, d)).to_pandas() for d in parts]
    return pd.concat(dfs, ignore_index=True)


def test_kill_and_resume(ray_session, synth_small, tmp_path):
    out = str(tmp_path / "flags_out")
    # crash after 3 partitions
    with pytest.raises(RuntimeError, match="injected failure"):
        lineage.run_resumable(synth_small, out, fail_after=3)
    m1 = lineage.load_manifest(out)
    assert len(m1) == 3
    # resume: finishes the rest, never re-runs the first 3
    stamps = {k: v["finished_at"] for k, v in m1.items()}
    manifest = lineage.run_resumable(synth_small, out)
    assert set(manifest) == set(lineage.partitions(synth_small))
    for k, s in stamps.items():
        assert manifest[k]["finished_at"] == s
    # resumed output equals a single-shot run
    got = _all_flags(out)
    exp = pipeline.flags_dataset(synth_small).to_pandas()
    key = ["map_name", "doc_id", "check_name"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[sorted(got.columns)],
        exp.sort_values(key).reset_index(drop=True)[sorted(exp.columns)],
        check_dtype=False)
    # metrics present per partition
    assert all(v["flags"] > 0 and v["wall_s"] >= 0 for v in manifest.values())


def test_report_render(ray_session, synth_small, tmp_path):
    p = str(tmp_path / "report.html")
    report.write_report(synth_small, p)
    html = open(p).read()
    # reference template structure (src/templates/report_template.html):
    # Summary / By countries / By check type / Errors sections
    assert "Serbian OSM lint - Results" in html
    assert "<a name='Summary'></a>Summary" in html
    assert "By countries" in html and "By check type" in html
    assert "Serbia checks (PBF)" in html
    assert "checks.WikipediaEntryExistsCheck" in html
    # entity cells link to the OSM object (template line 99)
    assert "https://www.openstreetmap.org/node/" in html
    # entities sorted by display name within an Errors section (A4);
    # A6: only error rows are listed
    import re
    sec = html.split("<h3 id='Serbia checks'>", 1)[1].split("</table>")[0]
    names = re.findall(r"<a href='[^']*'>([^<]*)</a>", sec)
    assert names == sorted(names)


def test_cell_sorted_layout(ray_session, synth_small, tmp_path):
    out = str(tmp_path / "sorted")
    files = lineage.write_cell_sorted(synth_small, out, num_files=4)
    assert len([f for f in files if f.endswith(".parquet")]) >= 1
    t = pq.read_table(out, columns=["morton"])
    m = t["morton"].to_numpy()
    # globally sorted across the whole layout (files read in name order)
    import numpy as np
    assert (np.diff(m) >= 0).all()
