# Mirrors the reference developer surface (make test / make lint).
test:
	python -m pytest tests/ -x -q

lint:
	python -m compileall -q event_based_optical_flow_tpu main.py bench.py __graft_entry__.py

bench:
	python bench.py

quickstart:
	python main.py --config_file configs/synthetic_quickstart.yaml
