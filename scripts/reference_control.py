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


class _SortedListdirOS:
    """``os`` proxy whose listdir is sorted.

    The reference enumerates dataset files with a bare ``os.listdir``
    (/root/reference/trajnetbaselines/lstm/data_load_utils.py:44) while this
    framework sorts (data/load.py).  With ``--sample`` the per-file
    ``random.sample`` draws consume the seeded RNG in file order, so an
    unsorted listing would give the two engines different subsets.  Installing
    this proxy on the reference's data_load_utils module (harness-level shim;
    the reference itself is untouched) makes the matched-budget ``--sample``
    subsets bit-identical across engines.
    """

    def __getattr__(self, name):
        return getattr(os, name)

    @staticmethod
    def listdir(path):
        return sorted(os.listdir(path))

argv = sys.argv[1:]
module = "lstm"
if "--module" in argv:
    i = argv.index("--module")
    module = argv[i + 1]
    argv = argv[:i] + argv[i + 2:]

preflight = "--preflight" in argv
if preflight:
    argv.remove("--preflight")

from trajnetbaselines.lstm import data_load_utils  # noqa: E402

data_load_utils.os = _SortedListdirOS()

if module == "sgan":
    from trajnetbaselines.sgan import trainer  # noqa: E402
else:
    from trajnetbaselines.lstm import trainer  # noqa: E402

sys.argv = ["reference_control"] + argv


class _PreflightDone(Exception):
    """Raised by the stubbed prepare_data: argparse + setup succeeded."""


if preflight:
    # Validate the exact argv against the reference trainer's own argparse
    # without training (VERDICT r4 #7: the round-4 SGAN control burned a
    # multi-hour slot on a bad flag discovered at launch).  main() is run
    # up to its first data-loading call, which is stubbed to abort; the
    # trainer's pre-data side effects (OUTPUT_BLOCK mkdir, mode='w' log
    # truncation) land in a scratch cwd so a preflight never clobbers a
    # real run's artifacts.
    import tempfile

    os.chdir(tempfile.mkdtemp(prefix="refctl_preflight_"))

    def _stop(*a, **k):
        raise _PreflightDone()

    trainer.prepare_data = _stop
    try:
        trainer.main()  # argparse errors exit 2 here on their own
    except _PreflightDone:
        print(f"PREFLIGHT OK ({module}): {argv}")
        sys.exit(0)
    print("PREFLIGHT FAILED: trainer.main returned before loading data")
    sys.exit(1)

# Real run: smoke the argv in a throwaway subprocess first so a bad flag
# dies in seconds, not after hours in a control queue.
import subprocess  # noqa: E402

rc = subprocess.call(
    [sys.executable, os.path.abspath(__file__), "--preflight",
     "--module", module] + argv
)
if rc != 0:
    print(f"reference_control: preflight rejected argv (rc={rc}); not training",
          file=sys.stderr)
    sys.exit(rc)

trainer.main()
