#!/bin/bash
# Build the native C++ data plane (reference parity: the reference's root
# compile.sh built its CUDA extension — SURVEY.md §2.18; here the native
# component is the host-side data plane, the TPU kernels are Pallas).
# The library also auto-builds on first import; this script just makes the
# build explicit and fails loudly.
set -e
cd "$(dirname "$0")"
python - <<'EOF'
from pointmvsnet_tpu import native
if not native.available():
    raise SystemExit(f"native build failed:\n{native.build_error()}")
print("native data plane built:", native._LIB)
EOF
