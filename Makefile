.PHONY: native test bench golden golden-offline clean

native:
	g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
	  matrix_factorization_tpu/native/loader.cpp \
	  -o matrix_factorization_tpu/native/_loader.so
	g++ -O3 -march=native -shared -fPIC -std=c++17 \
	  matrix_factorization_tpu/native/oracle.cpp \
	  -o matrix_factorization_tpu/native/_oracle.so

test:
	python -m pytest tests/ -q

bench:
	python bench.py

# real §6 golden table (needs network for the ML-100K download, or
# DATA=<path to u.data>); hermetic anchor: tests/test_golden_mini.py
golden:
	python benchmarks/golden_table.py $(if $(DATA),--data $(DATA))

# offline tier: recompute the committed per-family anchors and fail on
# drift (tests/data/golden_mini_family_expected.json)
golden-offline:
	PYTHONPATH=. JAX_PLATFORMS=cpu python tests/data/gen_golden_family.py

clean:
	rm -f matrix_factorization_tpu/native/*.so
	rm -rf .jax_cache __pycache__
