from changepoynt_spark.kernels import (BOCPD, CLASP, ESST, FLOSS, FLUSS, KLIEP,
                                       MESST, MSST, RuLSIF, SST, TESST, ULSIF,
                                       MovingWindow, SubspaceIdentification, ZERO)

__all__ = ['BOCPD', 'CLASP', 'ESST', 'FLOSS', 'FLUSS', 'KLIEP', 'MESST', 'MSST',
           'RuLSIF', 'SST', 'TESST', 'ULSIF', 'MovingWindow',
           'SubspaceIdentification', 'ZERO']
