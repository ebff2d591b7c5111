.PHONY: tests tests-fast native bench clean lint

native:
	g++ -O3 -shared -fPIC -std=c++17 -o models_tpu/data/native/fastbatch.so models_tpu/data/native/fastbatch.cc

tests: native
	python -m pytest tests/ -q

tests-fast:
	python -m pytest tests/unit -q -x

bench:
	python bench.py

graft-check:
	DRYRUN_DEVICES=8 python __graft_entry__.py

clean:
	rm -f models_tpu/data/native/fastbatch.so
	find . -name __pycache__ -type d | xargs rm -rf
