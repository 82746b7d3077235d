.PHONY: test bench smoke native clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

smoke:
	python scripts/hw_smoke.py

native:
	g++ -O2 -shared -fPIC -pthread -std=c++17 fft_wgpu_tpu/native/src/fftcore.cpp \
	    -o fft_wgpu_tpu/native/libfftcore.so

clean:
	rm -f fft_wgpu_tpu/native/libfftcore.so
	find . -name __pycache__ -type d -exec rm -rf {} +
