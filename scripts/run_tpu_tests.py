"""Run the real-TPU test tier and emit a machine-readable result artifact
(round-4 verdict item 8: hardware evidence as driver-visible JSON, not
prose).

    python scripts/run_tpu_tests.py --out TPU_TESTS_r05.json

Selects the Mosaic kernel-shape sweep (tests/test_tpu_kernel_sweep.py)
plus every @pytest.mark.tpu case in the suite, runs them with
GRAFT_TEST_TPU=1 against the attached chip, and writes
{"cases": {nodeid: "passed"|"failed"|...}, "summary": {...}} parsed from
the junit XML.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import xml.etree.ElementTree as ET

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="TPU_TESTS_r05.json")
    ap.add_argument("--timeout", type=int, default=3000)
    args = ap.parse_args(argv)

    xml_path = os.path.join(tempfile.mkdtemp(prefix="tpu_tests_"),
                            "junit.xml")
    env = dict(os.environ, GRAFT_TEST_TPU="1")
    # The hardware tier is the four kernel suites whose TPU-only cases are
    # gated on jax.default_backend() == "tpu" (plus @pytest.mark.tpu cases
    # inside them); a bare `-m tpu` filter would deselect the sweep, whose
    # gate is a module-level skipif, not the marker.
    cmd = [sys.executable, "-m", "pytest",
           "tests/test_tpu_kernel_sweep.py",
           "tests/test_pallas_attention.py",
           "tests/test_pallas_gather.py",
           "tests/test_pallas_stem.py",
           "-q", "--junit-xml", xml_path]
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=args.timeout)

    cases = {}
    summary = {"rc": proc.returncode}
    if os.path.exists(xml_path):
        root = ET.parse(xml_path).getroot()
        suite = root if root.tag == "testsuite" else root.find("testsuite")
        for k in ("tests", "failures", "errors", "skipped"):
            summary[k] = int(suite.get(k, 0))
        summary["time_s"] = float(suite.get("time", 0.0))
        for tc in suite.iter("testcase"):
            nodeid = f"{tc.get('classname')}::{tc.get('name')}"
            if tc.find("failure") is not None:
                cases[nodeid] = "failed"
            elif tc.find("error") is not None:
                cases[nodeid] = "error"
            elif tc.find("skipped") is not None:
                cases[nodeid] = "skipped"
            else:
                cases[nodeid] = "passed"
    else:
        summary["note"] = "no junit xml produced"
        summary["stdout_tail"] = proc.stdout[-2000:]

    import jax  # device identity for the record

    out = {
        "what": "real-TPU tier: Mosaic kernel-shape sweep + tpu-marked "
                "cases, compiled and executed on the attached chip",
        "device": str(jax.devices()[0]) if summary.get("rc") is not None
        else None,
        "summary": summary,
        "cases": cases,
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(summary))
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
