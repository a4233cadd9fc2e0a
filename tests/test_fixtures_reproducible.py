"""Fixture provenance: the committed .npz parity fixtures must match the
hashes recorded by tools/make_fixtures.py (which rebuilds them from the
reference implementation). Regenerate with:

    python tools/make_fixtures.py parity
"""

import hashlib
import json
import os

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def test_fixture_hashes_match_manifest():
    with open(os.path.join(FIXDIR, "HASHES.json")) as f:
        manifest = json.load(f)
    files = sorted(f for f in os.listdir(FIXDIR) if f.endswith(".npz"))
    assert files == sorted(manifest), "fixture set drifted from HASHES.json"
    for name, expected in manifest.items():
        with open(os.path.join(FIXDIR, name), "rb") as f:
            got = hashlib.sha256(f.read()).hexdigest()
        assert got == expected, f"{name} does not match its recorded hash"
