.PHONY: test bench bench-train bench-server serve demo clean

# micro-batched HTTP endpoint (see README "Serving"); CKPT=path required
serve:
	python -m tactilesr_tpu.server --checkpoint $(CKPT)

bench-server:
	python scripts/bench_server.py

test:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-train:
	python bench.py --train

# end-to-end smoke on CPU with synthetic data (see .claude/skills/verify)
demo:
	TACTILESR_PLATFORM=cpu TACTILESR_ROOT=/tmp/tactilesr_demo \
	  python -m tactilesr_tpu.data.generate synthetic \
	  --out-dir /tmp/tactilesr_demo/data/rotateDataset
	TACTILESR_PLATFORM=cpu TACTILESR_ROOT=/tmp/tactilesr_demo \
	  python train/tPSFNet_train.py --epochs 1 --sample_cnt 4 \
	  --train_batch_size 64 --compute_dtype float32 --inference_seqs_length 12

clean:
	rm -rf tactilesr_tpu/native/_libtsr_preprocess.so .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
