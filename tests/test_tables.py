"""Table-builder validation: independent explicit-loop re-integration of
sampled cells, written the way the reference Fortran does it
(module_mp_thompson09n.f90:3751-3809 etc.), compared against the einsum
builders."""
import numpy as np
import pytest

from kid_tpu import constants as c
from kid_tpu.tables import builders as B

TB = B.build_all_tables(iiwarm=False)


def _vr(d):
    return (-0.1021 + 4.932e3 * d - 0.9551e6 * d * d
            + 0.07934e9 * d ** 3 - 0.002362e12 * d ** 4)


def _rain_psd_cell(k, m):
    lam_exp = (c.N0R_EXP_AXIS[k] * c.AM_R * c.CRG[1] / c.R_R_AXIS[m]) ** c.ORE1
    lamr = lam_exp * (c.CRG[3] * c.ORG2 * c.ORG1) ** c.OBMR
    n0_r = c.N0R_EXP_AXIS[k] / (c.CRG[2] * lam_exp) * lamr ** c.CRE[2]
    return n0_r * c.DR_BINS ** c.MU_R * np.exp(-lamr * c.DR_BINS) * c.DTR_BINS


@pytest.mark.parametrize("i,j,k,m", [(0, 0, 0, 0), (10, 15, 20, 25),
                                     (27, 27, 36, 36), (5, 20, 30, 10)])
def test_qr_acr_qg_cell(i, j, k, m):
    # explicit double-loop integration of one cell (f90:3762-3806)
    lam_exp = (c.N0G_EXP_AXIS[i] * c.AM_G * c.CGG[1] / c.R_G_AXIS[j]) ** c.OGE1
    lamg = lam_exp * (c.CGG[3] * c.OGG2 * c.OGG1) ** c.OBMG
    n0_g = c.N0G_EXP_AXIS[i] / (c.CGG[2] * lam_exp) * lamg ** c.CGE[2]
    n_g = n0_g * c.DG_BINS ** c.MU_G * np.exp(-lamg * c.DG_BINS) * c.DTG_BINS
    n_r = _rain_psd_cell(k, m)
    vr = _vr(c.DR_BINS)
    vg = c.AV_G * c.DG_BINS ** c.BV_G
    t1 = z1 = y1 = t2 = y2 = z2 = 0.0
    for n2 in range(c.NBR):
        massr = c.AM_R * c.DR_BINS[n2] ** c.BM_R
        for n in range(c.NBG):
            massg = c.AM_G * c.DG_BINS[n] ** c.BM_G
            dvg = max(vr[n2] - vg[n], 0.0)
            dvr = max(vg[n] - vr[n2], 0.0)
            kern = (c.PI * 0.25 * c.EF_RG
                    * (c.DG_BINS[n] + c.DR_BINS[n2]) ** 2
                    * n_g[n] * n_r[n2])
            t1 += kern * dvg * massg
            z1 += kern * dvg * massr
            y1 += kern * dvg
            t2 += kern * dvr * massr
            y2 += kern * dvr
            z2 += kern * dvr * massg
    np.testing.assert_allclose(TB.tcg_racg[i, j, k, m], t1, rtol=1e-10)
    np.testing.assert_allclose(TB.tmr_racg[i, j, k, m],
                               min(z1, c.R_R_AXIS[m]), rtol=1e-10)
    np.testing.assert_allclose(TB.tcr_gacr[i, j, k, m], t2, rtol=1e-10)
    np.testing.assert_allclose(TB.tmg_gacr[i, j, k, m], z2, rtol=1e-10)
    np.testing.assert_allclose(TB.tnr_racg[i, j, k, m], y1, rtol=1e-10)
    np.testing.assert_allclose(TB.tnr_gacr[i, j, k, m], y2, rtol=1e-10)


@pytest.mark.parametrize("i,j,k,m", [(0, 0, 0, 0), (14, 4, 18, 20),
                                     (27, 8, 36, 36)])
def test_qr_acr_qs_cell(i, j, k, m):
    # explicit re-integration with the mass-ratio branch (f90:3990-4028)
    n_r = _rain_psd_cell(k, m)
    m2 = c.R_S_AXIS[i] * c.OAMS
    _, m3 = B.snow_moments_from_m2(m2, c.TC_AXIS[j])
    mrat = m2 * (m2 / m3) ** 3
    m0 = (m2 / m3) ** c.MU_S
    slam1 = m2 / m3 * c.LAM0
    slam2 = m2 / m3 * c.LAM1
    n_s = mrat * (c.KAP0 * np.exp(-slam1 * c.DS_BINS)
                  + c.KAP1 * m0 * c.DS_BINS ** c.MU_S
                  * np.exp(-slam2 * c.DS_BINS)) * c.DTS_BINS
    vr = _vr(c.DR_BINS)
    vs = 1.5 * c.AV_S * c.DS_BINS ** c.BV_S * np.exp(-c.FV_S * c.DS_BINS)
    acc = np.zeros(12)
    for n2 in range(c.NBR):
        massr = c.AM_R * c.DR_BINS[n2] ** c.BM_R
        for n in range(c.NBS):
            masss = c.AM_S * c.DS_BINS[n] ** c.BM_S
            dvs = max(vr[n2] - vs[n], 0.0)
            dvr = max(vs[n] - vr[n2], 0.0)
            kern = (c.PI * 0.25 * c.EF_RS
                    * (c.DS_BINS[n] + c.DR_BINS[n2]) ** 2
                    * n_s[n] * n_r[n2])
            big = massr > 1.5 * masss
            if big:
                acc[0] += kern * dvs * masss   # t1
                acc[1] += kern * dvs * massr   # z1
                acc[8] += kern * dvs           # y1
                acc[4] += kern * dvr * massr   # t2
                acc[5] += kern * dvr * masss   # z2
                acc[10] += kern * dvr          # y2
            else:
                acc[2] += kern * dvs * masss   # t3
                acc[3] += kern * dvs * massr   # z3
                acc[9] += kern * dvs           # y3
                acc[6] += kern * dvr * massr   # t4
                acc[7] += kern * dvr * masss   # z4
                acc[11] += kern * dvr          # y4
    np.testing.assert_allclose(TB.tcs_racs1[i, j, k, m], acc[0], rtol=1e-10)
    np.testing.assert_allclose(TB.tmr_racs1[i, j, k, m],
                               min(acc[1], c.R_R_AXIS[m]), rtol=1e-10)
    np.testing.assert_allclose(TB.tcs_racs2[i, j, k, m], acc[2], rtol=1e-10)
    np.testing.assert_allclose(TB.tmr_racs2[i, j, k, m], acc[3], rtol=1e-10)
    np.testing.assert_allclose(TB.tcr_sacr1[i, j, k, m], acc[4], rtol=1e-10)
    np.testing.assert_allclose(TB.tms_sacr1[i, j, k, m], acc[5], rtol=1e-10)
    np.testing.assert_allclose(TB.tcr_sacr2[i, j, k, m], acc[6], rtol=1e-10)
    np.testing.assert_allclose(TB.tms_sacr2[i, j, k, m], acc[7], rtol=1e-10)
    np.testing.assert_allclose(TB.tnr_racs1[i, j, k, m], acc[8], rtol=1e-10)
    np.testing.assert_allclose(TB.tnr_racs2[i, j, k, m], acc[9], rtol=1e-10)
    np.testing.assert_allclose(TB.tnr_sacr1[i, j, k, m], acc[10], rtol=1e-10)
    np.testing.assert_allclose(TB.tnr_sacr2[i, j, k, m], acc[11], rtol=1e-10)


@pytest.mark.parametrize("i,j,k", [(0, 0, 0), (20, 18, 22), (36, 36, 44)])
def test_freeze_rain_cell(i, j, k):
    # rain freezing re-integration (f90:4123-4148), T_adjust = -3 final state
    texp = np.exp(float(k + 1) + 3.0) - 1.0
    n_r = _rain_psd_cell(j, i)
    s1 = sn1 = s2 = sn2 = 0.0
    for n2 in range(c.NBR - 1, -1, -1):
        massr = c.AM_R * c.DR_BINS[n2] ** c.BM_R
        vol = massr / c.RHO_W
        prob = 1.0 - np.exp(-120.0 * vol * 5.2e-4 * texp)
        if massr < c.XM0G:
            sn1 += prob * n_r[n2]
            s1 += prob * n_r[n2] * massr
        else:
            sn2 += prob * n_r[n2]
            s2 += prob * n_r[n2] * massr
    np.testing.assert_allclose(TB.tpi_qrfz[i, j, k], s1, rtol=1e-10)
    np.testing.assert_allclose(TB.tni_qrfz[i, j, k], sn1, rtol=1e-10)
    np.testing.assert_allclose(TB.tpg_qrfz[i, j, k], s2, rtol=1e-10)
    np.testing.assert_allclose(TB.tnr_qrfz[i, j, k], sn2, rtol=1e-10)


@pytest.mark.parametrize("i,k", [(0, 0), (18, 22), (36, 44), (30, 5)])
def test_freeze_cloud_cell_early_exit(i, k):
    # cloud freezing with the sum1 >= r_c early EXIT (f90:4155-4170)
    texp = np.exp(float(k + 1) + 3.0) - 1.0
    nt_c1 = c.T_NC[0]
    nu_c = min(15, int(np.floor(1000.0e6 / nt_c1 + 0.5)) + 2)
    lamc = (nt_c1 * c.AM_R * c.CCG[2, nu_c] * c.OCG1[nu_c]
            / c.R_C_AXIS[i]) ** c.OBMR
    n0_c = nt_c1 * c.OCG1[nu_c] * lamc ** c.CCE[1, nu_c]
    s1 = sn2 = 0.0
    for n in range(c.NBC - 1, -1, -1):
        massc = c.AM_R * c.DC_BINS[n] ** c.BM_R
        vol = massc / c.RHO_W
        prob = 1.0 - np.exp(-120.0 * vol * 5.2e-4 * texp)
        n_c = (n0_c * c.DC_BINS[n] ** nu_c * np.exp(-lamc * c.DC_BINS[n])
               * c.DTC_BINS[n])
        sn2 = min(nt_c1, sn2 + prob * n_c)
        s1 += prob * n_c * massc
        if s1 >= c.R_C_AXIS[i]:
            break
    np.testing.assert_allclose(TB.tpi_qcfz[i, k], s1, rtol=1e-10)
    np.testing.assert_allclose(TB.tni_qcfz[i, k], sn2, rtol=1e-10)


@pytest.mark.parametrize("i,j", [(0, 0), (30, 25), (63, 54), (40, 10)])
def test_qi_aut_qs_cell(i, j):
    lami = (c.AM_I * c.CIG[2] * c.OIG1 * c.NT_I_AXIS[j]
            / c.R_I_AXIS[i]) ** c.OBMI
    di_mean = (c.BM_I + c.MU_I + 1.0) / lami
    n0_i = c.NT_I_AXIS[j] * c.OIG1 * lami ** c.CIE[1]
    if np.float32(di_mean) > 5.0 * c.D0S:
        t1, t2, tide = c.R_I_AXIS[i], c.NT_I_AXIS[j], 0.0
    elif np.float32(di_mean) < c.D0I:
        t1, t2, tide = 0.0, 0.0, 1.0
    else:
        from scipy.special import gammainc
        tide = gammainc(c.MU_I + 2.0, lami * c.D0S)
        t1 = t2 = 0.0
        for n2 in range(c.NBI):
            n_i = (n0_i * c.DI_BINS[n2] ** c.MU_I
                   * np.exp(-lami * c.DI_BINS[n2]) * c.DTI_BINS[n2])
            if c.DI_BINS[n2] >= c.D0S:
                t1 += n_i * c.AM_I * c.DI_BINS[n2] ** c.BM_I
                t2 += n_i
    np.testing.assert_allclose(TB.tps_iaus[i, j], t1, rtol=1e-10, atol=1e-30)
    np.testing.assert_allclose(TB.tni_iaus[i, j], t2, rtol=1e-10, atol=1e-30)
    np.testing.assert_allclose(TB.tpi_ide[i, j], tide, rtol=1e-7)


def test_efrw_spot():
    # Beard-Grover branch spot check (f90:4278-4290)
    i, j = 10, 10   # Dr ~ 80 um, Dc = 11 um -> p < 0.25
    dr, dc = c.DR_BINS[i], c.DC_BINS[j]
    p = dc / dr
    assert p <= 0.25
    vtr = _vr(dr)
    stokes = dc * dc * vtr * c.RHO_W / (9.0 * 1.718e-5 * dr)
    reynolds = 9.0 * stokes / (p * p * c.RHO_W)
    f = np.log(reynolds)
    g = -0.1007 - 0.358 * f + 0.0261 * f * f
    k0 = np.exp(g)
    zz = np.log(stokes / (k0 + 1e-15))
    h = 0.1465 + 1.302 * zz - 0.607 * zz ** 2 + 0.293 * zz ** 3
    yc0 = 2.0 / c.PI * np.arctan(h)
    ef = min(max((yc0 + p) ** 2 / (1.0 + p) ** 2, 0.0), 0.95)
    np.testing.assert_allclose(TB.t_efrw[i, j], ef, rtol=1e-12)
    # guard branches
    assert TB.t_efrw[0, 0] == 0.0          # Dc < 3 um
    assert (TB.t_efrw <= 0.95).all() and (TB.t_efrw >= 0.0).all()


def test_efsw_guards():
    assert (TB.t_efsw <= 0.95).all() and (TB.t_efsw >= 0.0).all()
    # Dc < 6 um column must be zero (f90:4322)
    assert (TB.t_efsw[:, :4] == 0.0).all()


def test_drop_evap_prefix_sums():
    # tnc_wev must be nondecreasing in the D* bin axis and bounded by t_Nc
    assert (np.diff(TB.tnc_wev, axis=0) >= 0.0).all()
    np.testing.assert_allclose(TB.tnc_wev[-1, 0, 0], c.T_NC[0], rtol=0.05)


def test_warm_tables_zeroed():
    warm = B.build_all_tables(iiwarm=True)
    assert warm.tcg_racg.max() == 0.0
    assert warm.tpi_qcfz.max() == 0.0
    assert warm.t_efrw.max() > 0.0   # warm builders still run
