.PHONY: test native quality bench

test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C native

bench:
	python bench.py

# lint gate (reference Makefile runs black/isort/flake8; this env ships none
# of them, so the gate is compile-checking every module)
quality:
	python -m compileall -q open_muse_tpu scripts benchmark tests
