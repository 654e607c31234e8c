from evreal_tpu.data.memmap import Sequence
from evreal_tpu.data.packing import pack_windows, bucket_capacity, plan_capacity
