# Convenience targets; see README.md for details.

DATA_ROOT ?= /root/reference/DATA_BLOCK
PATH_NAME ?= trajdata_split

.PHONY: test test-fast bench data train-dlstm eval-dlstm eval-classical dryrun \
	protocol extras results

# full published 5-seed protocol over all model families (resumable)
protocol:
	bash scripts/run_protocol.sh

# goals / NMMP / variety sweeps + the 50-mode NLL evaluator drive
extras:
	bash scripts/run_extras.sh

# aggregate per-seed eval results into mean+-std groups
results:
	python -m trajnetplusplusbaselines_tpu.tools.collect_results \
	    --path $(PATH_NAME) --out results_seeds.json

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q --deselect tests/test_parity_lstm.py

bench:
	python bench.py

# carve train/val/test from the reference's bundled trajdata
data:
	python -m trajnetplusplusbaselines_tpu.tools.create_validation \
	    --path trajdata --data_root $(DATA_ROOT) --val_ratio 0.1 --test_ratio 0.15

train-dlstm:
	python -m trajnetplusplusbaselines_tpu.trainers.lstm \
	    --type directional --augment --path $(PATH_NAME) --output makefile

eval-dlstm:
	python -m trajnetplusplusbaselines_tpu.evaluator.lstm_cli \
	    --path $(PATH_NAME) \
	    --output OUTPUT_BLOCK/$(PATH_NAME)/lstm_directional_makefile.pkl

eval-classical:
	python -m trajnetplusplusbaselines_tpu.evaluator.classical_cli \
	    --path $(PATH_NAME) --cv --kf

# dryrun_multichip self-bootstraps its virtual CPU devices
dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
