# Developer entry points (parity with /root/reference/Makefile:1-27).

.PHONY: all test test-fast bench native baseline clean format docs figures

all: native

native:
	bash flatnav_tpu/native/build_native.sh

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not sharding"

bench:
	python bench.py

# reference C++ single-core baseline -> baseline_ref.json
baseline:
	bash tools/reference_baseline/build_baseline.sh

# regenerate docs/api_reference.md from docstrings (CI checks staleness)
docs:
	python docs/generate_api_docs.py

# paper-figure plots from recorded benchmarks/results_*.json
figures:
	python benchmarks/plot_figures.py

format:
	@command -v ruff >/dev/null && ruff format flatnav_tpu tests tools || \
	  echo "ruff not installed; skipping"

clean:
	rm -f flatnav_tpu/native/libflatnav_native.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
