# Convenience targets. The native seg library builds itself on first use;
# `make native` forces it.

.PHONY: test test-fast bench native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x --ignore=tests/test_edit_pipeline.py \
		--ignore=tests/test_sds_modes.py --ignore=tests/test_data_and_recon.py

bench:
	python bench.py

native:
	g++ -O3 -shared -fPIC -std=c++17 native/maxflow.cpp native/components.cpp \
		-o native/libvoxeseg.so

clean:
	rm -rf .jax_cache native/libvoxeseg.so .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
