#!/bin/bash
# Person replacement launcher — same surface as the reference
# tools/replace.sh: bash tools/replace.sh replace <src>
script=$1
src=$2
PY_ARGS=${@:3}
export PYTHONPATH=./:${PYTHONPATH}
python tools/replace/${script}.py --src ${src} ${PY_ARGS}
