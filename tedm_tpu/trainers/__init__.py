"""Experiment trainers, one module per reference trainer family:

* ``common``        — the shared supervised train/validate loop
                      (reference: trainers/train_baseline.py:17-161)
* ``baseline``      — supervised UNet on JSRT (train_baseline.py:164-211)
* ``diffusion``     — DDPM backbone on CXR14/JSRT (train_CXR14.py,
                      train_base_diffusion.py)
* ``datasetdm``     — LEDM / LEDMe / TEDM classifier training
                      (train_datasetDM.py, models/datasetDM_model.py)
* ``per_step``      — PDDM per-step linear probes (datasetDM_per_step.py)
* ``contrastive``   — global/local CL pretraining + finetunes
                      (train_global_cl.py, train_local_cl.py,
                      finetune_glob_cl.py, finetune_glob_loc_cl.py)

Every module exposes ``main(config)``; the dispatcher lives in
``tedm_tpu.train`` (reference: train.py).
"""
