"""Line-level corpus dedup (CCNet-style rewrite): keep-first semantics,
rewrite integrity, and the bounded duplicated-line-directory guard."""

import hashlib

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_line_dedup_keep_first_and_rewrite(ray_session):
    from yj_schema_validator_ray.pipelines.curation import line_dedup
    from yj_schema_validator_ray.sources.corpus import TEMPLATES

    out = line_dedup(SF).to_pandas().sort_values("i").reset_index(drop=True)
    assert len(out) == 500
    # every removed count is within the doc's line budget
    assert (out.n_removed <= out.n_lines).all()
    assert (out.n_removed >= 0).all()
    # boilerplate exists in this corpus -> something was removed
    assert out.n_removed.sum() > 0

    # keep-first: reconstruct the expected rewrite driver-side for the
    # first 50 docs (tiny) and compare md5 byte-for-byte
    contents = {}
    for i in range(50):
        pre, post = TEMPLATES[i % 10]
        contents[i] = pre + str(i) + post
    first_seen = {}
    for i in range(50):
        for ln, line in enumerate(contents[i].split("\n"), start=1):
            first_seen.setdefault(line, []).append((i, ln))
    # global duplicate decision must use the FULL corpus, so recompute
    # counts over all 500 docs
    full_counts = {}
    full_first = {}
    for i in range(500):
        pre, post = TEMPLATES[i % 10]
        for ln, line in enumerate((pre + str(i) + post).split("\n"),
                                  start=1):
            full_counts[line] = full_counts.get(line, 0) + 1
            full_first.setdefault(line, (i, ln))
    for i in range(50):
        kept = []
        for ln, line in enumerate(contents[i].split("\n"), start=1):
            if full_counts[line] > 1 and full_first[line] != (i, ln):
                continue
            kept.append(line)
        txt = "\n".join(kept)
        row = out[out.i == i].iloc[0]
        assert row.cleaned_md5 == hashlib.md5(txt.encode()).hexdigest(), i
        assert row.cleaned_len == len(txt)


def test_line_dedup_directory_guard(ray_session):
    from yj_schema_validator_ray.pipelines.curation import line_dedup

    with pytest.raises(ValueError, match="max_dup_lines"):
        # every duplicated line trips a zero budget
        line_dedup(SF, max_dup_lines=0).materialize()
