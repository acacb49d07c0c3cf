# -*- coding: utf-8 -*-
"""Fix-applier tests: changeset batching (20 edits per changeset) and the
dry-run log sink."""

import json

import pytest

from osmlint import applier, fixes


def test_apply_fixes_batching(ray_session, synth_small, tmp_path):
    ds = fixes.fix_plan_dataset(synth_small)
    log = str(tmp_path / "edits.jsonl")
    stats = applier.apply_fixes(ds, log, batch_size=20)
    rows = [json.loads(l) for l in open(log)]
    assert stats["edits"] == len(rows) > 0
    # changesets hold at most 20 edits and are contiguous / monotone
    from collections import Counter
    per_cs = Counter(r["changeset"] for r in rows)
    assert max(per_cs.values()) <= 20
    assert sorted(per_cs) == list(range(1, stats["changesets"] + 1))
    full = [per_cs[c] for c in sorted(per_cs)][:-1]
    assert all(v == 20 for v in full)            # only the last may be partial


def test_live_mode_refuses(ray_session, tmp_path):
    import ray
    with pytest.raises(Exception):
        a = applier.OsmWriterActor.remote(str(tmp_path / "x"), 20, False)
        ray.get(a.flush.remote())
