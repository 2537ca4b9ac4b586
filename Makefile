# Developer entry points (no network required; see README / docs/FLAGS.md)

.PHONY: test bench smoke configs native clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

# End-to-end smoke of both phases + inference on the synthetic corpus.
smoke:
	python train.py --phase pretrain --num_blocks 2 --num_channels 16 \
	    --batch_size 4 --patch_size 24 --steps_per_epoch 6 --num_epochs 1 \
	    --train_dataset synthetic --valid_dataset synthetic --num_valids 2 \
	    --log_every 3 --snapshot_every 1 --check_point /tmp/pesr_smoke
	python test.py --dataset synthetic --model_path /tmp/pesr_smoke \
	    --num_blocks 2 --num_channels 16 --output_dir /tmp/pesr_smoke_out

# The five driver-defined benchmark configs (BASELINE.md).
configs:
	for n in 1 2 3 4 5; do python benchmarks/run.py --config $$n; done

native:
	g++ -O3 -shared -fPIC -std=c++17 pesr_tpu/data/native/sampler.cpp \
	    -lpng -pthread -o pesr_tpu/data/native/libpesr_data.so

clean:
	rm -rf .jax_cache .pytest_cache pesr_tpu/data/native/libpesr_data.so
	find . -name __pycache__ -type d -exec rm -rf {} +
