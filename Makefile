# Convenience targets for cu-net-tpu

test:            ## full suite on the 8-virtual-device CPU mesh (~5 min warm)
	python -m pytest tests/ -q

bench:           ## headline TPU benchmark (one JSON line)
	python bench.py

native:          ## build the C++ host library
	python -c "from cunet_tpu.data.native import native_available; assert native_available(); print('libcunet_host.so OK')"

smoke:           ## tiny end-to-end CLI training run on synthetic data
	python -m cunet_tpu.cli.train --exp_id smoke --exp_dir /tmp/cunet-smoke \
	  --dataset synthetic --layer_num 2 --order 1 --class_num 4 --loss_num 2 \
	  --bs 4 --nEpochs 1 --synthetic_len 8 --compute_dtype float32 --nThreads 0 \
	  --neck_size 2 --growth_rate 8 --init_chan_num 16 --num_blocks 2 \
	  --inp_res 32 --out_res 8

smoke-tpu:       ## on-chip flagship regression smoke (train K=8, eval K=16)
	python tools/tpu_smoke.py

.PHONY: test bench native smoke smoke-tpu
