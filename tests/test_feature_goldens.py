"""Released-weight golden harness (scripts/feature_goldens.py): the
record -> check round trip and the preprocessing torch-parity pin must run
end-to-end in this environment (synthetic/offline weights), so the same
unmodified script validates real checkpoints where they exist."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np

SCRIPT = Path(__file__).resolve().parent.parent / "scripts" / \
    "feature_goldens.py"


class TestFeatureGoldens:
    def test_record_then_check_roundtrip(self, tmp_path):
        sys.path.insert(0, str(SCRIPT.parent))
        try:
            import feature_goldens as fg
        finally:
            sys.path.pop(0)

        golden = fg.record(tmp_path / "g.json")
        assert "dinov2" in golden["extractors"]
        assert "clip-vit" in golden["extractors"]
        assert "sam" in golden["extractors"]
        # Offline environment: extractors run the synthetic stand-ins and
        # the golden records that mode explicitly.
        assert golden["extractors"]["dinov2"]["pretrained"] in (True, False)
        assert fg.check(tmp_path / "g.json") == 0

        # Tampered golden -> check fails loudly.
        data = json.loads((tmp_path / "g.json").read_text())
        data["extractors"]["dinov2"]["features"]["mean"] += 1.0
        (tmp_path / "g.json").write_text(json.dumps(data))
        assert fg.check(tmp_path / "g.json") == 1

    def test_test_image_deterministic(self):
        sys.path.insert(0, str(SCRIPT.parent))
        try:
            import feature_goldens as fg
        finally:
            sys.path.pop(0)
        a, b = fg.make_test_image(), fg.make_test_image()
        np.testing.assert_array_equal(a, b)
        assert a.shape == (480, 640, 3)
        assert 0.0 <= a.min() and a.max() <= 1.0

    def test_prep_parity_subprocess(self):
        """The torch-chain preprocessing pin passes in this environment
        (torch + PIL are installed)."""
        r = subprocess.run(
            [sys.executable, str(SCRIPT), "--prep-parity"],
            capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "OK" in r.stdout
