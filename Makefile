# Convenience targets; see README.md for details.

DATA_ROOT ?= /root/reference/DATA_BLOCK
PATH_NAME ?= trajdata_split

.PHONY: test test-fast bench data train-dlstm eval-dlstm eval-classical dryrun

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

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c \
	    "import jax; jax.config.update('jax_platforms','cpu'); \
	     import __graft_entry__ as g; g.dryrun_multichip(8)"
