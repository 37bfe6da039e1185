#!/usr/bin/env bash
# Build engine.zip for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f engine.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile('engine.zip', 'w', zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk('changepoynt_spark'):
        if '__pycache__' in root:
            continue
        for f in files:
            if f.endswith('.py'):
                z.write(os.path.join(root, f))
print('engine.zip written')
EOF
