from cape_tpu.data.loader import BodyData, BatchStream
from cape_tpu.data.synthetic import synthetic_bodydata
