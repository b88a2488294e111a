from cape_tpu.models.cape import CAPE
from cape_tpu.models.gmm import GMM
