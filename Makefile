# Dev entrypoints (reference Makefile:38-39 `make test` / lint CI).
.PHONY: all test lint format bench native clean

all: native

test:
	python -m pytest tests/ -q

lint:
	ruff check tts_max_tpu tools tests

format:
	ruff format tts_max_tpu tools tests

bench:
	python bench.py

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
