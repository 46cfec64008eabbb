.PHONY: test test-fast bench bench-quick train-synth native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x --ignore=tests/test_parallel.py \
	    --ignore=tests/test_torch_parity.py

bench:
	python bench.py

bench-quick:
	python bench.py --quick

train-synth:
	python api/train.py --config config/train_synth.yaml

native:
	g++ -O3 -shared -fPIC -std=c++17 native/levenshtein.cpp \
	    native/latex_tokenizer.cpp -o native/_doc2tex_native.so

clean:
	rm -f native/_doc2tex_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
