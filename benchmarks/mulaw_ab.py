"""DER A/B: exact int16 uploads vs opt-in 8-bit mu-law uploads.

Same synthetic corpus as clustering_ab.py; reports DER with the default
(bit-exact for PCM16) upload path and with
PYANNOTE_TPU_UPLOAD_QUANT=mulaw. Untrained debug models exaggerate
decision sensitivity, so the delta is an upper bound on what trained
models would see. Results recorded in docs/PARITY.md.

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python benchmarks/mulaw_ab.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/pyannote_tpu_jax_cache")

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))

from clustering_ab import build_corpus, run  # noqa: E402


def main():
    import tempfile
    root = Path(tempfile.mkdtemp(prefix="pat_mulaw_ab_"))
    files = build_corpus(root)
    os.environ.pop("PYANNOTE_TPU_UPLOAD_QUANT", None)
    exact_der, exact_wall = run(files, "AgglomerativeClustering",
                                device=False)
    out = {"exact_der": round(exact_der, 4),
           "exact_wall_s": round(exact_wall, 2)}
    for mode in ("mulaw", "dpcm4"):
        os.environ["PYANNOTE_TPU_UPLOAD_QUANT"] = mode
        der, wall = run(files, "AgglomerativeClustering", device=False)
        os.environ.pop("PYANNOTE_TPU_UPLOAD_QUANT", None)
        out[f"{mode}_der"] = round(der, 4)
        out[f"{mode}_der_delta"] = round(der - exact_der, 4)
        out[f"{mode}_wall_s"] = round(wall, 2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
