from evreal_tpu.nn import layers, cells, attention
