"""CLI entry points — flag-for-flag equivalents of the reference scripts.

  python -m vaegam_tpu.cli.preproc     <-> pre_proc_vaefmri.py
  python -m vaegam_tpu.cli.add_signal  <-> add_control_signal.py
  python -m vaegam_tpu.cli.beta_maps   <-> get_beta_map_regularizer.py
  python -m vaegam_tpu.cli.train       <-> multsubj_reg_run_GP.py

Checkpoint migration (both directions, no reference-side changes needed):

  python -m vaegam_tpu.cli.import_torch_ckpt   reference .tar -> ours
  python -m vaegam_tpu.cli.export_torch_ckpt   ours -> reference .tar
"""
