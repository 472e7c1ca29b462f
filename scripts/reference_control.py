"""Run the reference engine's trainer on this repo's split (quality control).

Executes /root/reference/trajnetbaselines/lstm/trainer.py:main unmodified
(through tests/reference_harness.py, which satisfies its external
``trajnetplusplustools`` dependency with this framework's own data layer) so
the reference and the TPU framework train on the *same* ``trajdata_split``
data.  This settles whether quality deltas vs the published table
(/root/reference/README.rst:84-98) come from the split or from the engine.

Usage (flags are the reference trainer's own; --module picks the engine):
    python scripts/reference_control.py --type vanilla --augment \
        --save_every 25 --path trajdata_split --seed 42 --output refctl_seed42
    python scripts/reference_control.py --module sgan --type directional \
        --k 3 --augment --save_every 25 --path trajdata_split --seed 42 \
        --output refctl_seed42
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

from tests.reference_harness import load_reference  # noqa: E402

load_reference()

argv = sys.argv[1:]
module = "lstm"
if "--module" in argv:
    i = argv.index("--module")
    module = argv[i + 1]
    argv = argv[:i] + argv[i + 2:]

if module == "sgan":
    from trajnetbaselines.sgan import trainer  # noqa: E402
else:
    from trajnetbaselines.lstm import trainer  # noqa: E402

sys.argv = ["reference_control"] + argv
trainer.main()
