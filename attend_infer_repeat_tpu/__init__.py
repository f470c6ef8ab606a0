"""attend_infer_repeat_tpu: a TPU-native Attend-Infer-Repeat framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the public
``akosiorek/attend_infer_repeat`` TF1 reference (see SURVEY.md for the
structural analysis this build follows).
"""

__version__ = "0.1.0"
