# Convenience targets (reference: Makefile with bin/lib/pylib/examples)
.PHONY: native test bench examples clean

export PYTHONPATH := $(CURDIR):$(PYTHONPATH)

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

bench:
	python bench.py

examples: native
	python -c "from dsrc_tpu.utils.synth import make_fastq; \
	  open('/tmp/example.fastq','wb').write(make_fastq(2000, 100, seed=7))"
	python examples/example1.py /tmp/example.fastq /tmp/example.xfqz /tmp/example.out.fastq
	cmp /tmp/example.fastq /tmp/example.out.fastq
	python examples/example2.py /tmp/example2.xfqz

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
