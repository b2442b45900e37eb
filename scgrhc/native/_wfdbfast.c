/* _wfdbfast — native WFDB .dat decoder for scgrhc.
 *
 * Fuses sample decoding (formats 16 / 24 / 32 / 61 / 80 / 160 / 212),
 * de-interleaving, invalid-sample sentinel mapping (NaN, like
 * wfdb.rdrecord), and per-signal baseline/gain calibration into a
 * single C pass that writes the final float64 (sig_len, n_sig)
 * physical-signal matrix.  The NumPy fallback in scgrhc/io/wfdb.py
 * performs the same work as ~6 vectorized passes with intermediate
 * allocations; for multi-hour 500 Hz clinical records this path halves
 * record-load latency and peak memory.  (Semantics reference:
 * recordutil.py:137 wfdb.rdrecord; format definitions + sentinel values
 * per the WFDB spec: -32768 for fmt 16/61/160, -2147483648 for fmt 32,
 * -8388608 for fmt 24, -128 for fmt 80, -2048 for fmt 212.  The packed
 * 10-bit formats 310/311 stay on the NumPy path — see scgrhc/io/wfdb.py
 * _decode_stream — as does fmt 8, whose cumulative-difference decode is
 * inherently serial per signal.)
 */
#define PY_SSIZE_T_CLEAN
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <Python.h>
#include <numpy/arrayobject.h>
#include <math.h>
#include <stdint.h>

/* decode_calibrate(raw: bytes, fmt: int, n_sig: int, sig_len: int,
 *                  baselines: sequence of int, gains: sequence of float)
 *   -> float64 ndarray (sig_len, n_sig)
 */
static PyObject *
decode_calibrate(PyObject *self, PyObject *args)
{
    Py_buffer raw;
    int fmt;
    Py_ssize_t n_sig, sig_len;
    PyObject *baselines_obj, *gains_obj;

    if (!PyArg_ParseTuple(args, "y*innOO", &raw, &fmt, &n_sig, &sig_len,
                          &baselines_obj, &gains_obj))
        return NULL;

    PyObject *result = NULL;
    double *gains = NULL;
    double *baselines = NULL;

    if (n_sig <= 0 || sig_len < 0) {
        PyErr_SetString(PyExc_ValueError, "n_sig/sig_len out of range");
        goto done;
    }

    baselines = (double *)PyMem_Malloc(sizeof(double) * (size_t)n_sig);
    gains = (double *)PyMem_Malloc(sizeof(double) * (size_t)n_sig);
    if (!baselines || !gains) {
        PyErr_NoMemory();
        goto done;
    }
    for (Py_ssize_t i = 0; i < n_sig; i++) {
        PyObject *b = PySequence_GetItem(baselines_obj, i);
        PyObject *g = PySequence_GetItem(gains_obj, i);
        if (!b || !g) {
            Py_XDECREF(b);
            Py_XDECREF(g);
            goto done;
        }
        baselines[i] = PyFloat_AsDouble(b);
        gains[i] = PyFloat_AsDouble(g);
        Py_DECREF(b);
        Py_DECREF(g);
        if (PyErr_Occurred())
            goto done;
        if (gains[i] == 0.0)
            gains[i] = 200.0; /* WFDB default gain for 0 */
    }

    const Py_ssize_t total = n_sig * sig_len;
    Py_ssize_t avail;
    const uint8_t *buf = (const uint8_t *)raw.buf;
    switch (fmt) {
    case 16: avail = raw.len / 2; break;
    case 61: avail = raw.len / 2; break;
    case 160: avail = raw.len / 2; break;
    case 24: avail = raw.len / 3; break;
    case 32: avail = raw.len / 4; break;
    case 80: avail = raw.len; break;
    case 212: avail = (raw.len / 3) * 2; break;
    default:
        PyErr_Format(PyExc_ValueError, "Unsupported WFDB format %d", fmt);
        goto done;
    }
    if (avail < total) {
        PyErr_Format(PyExc_ValueError,
                     ".dat holds %zd samples but header promises %zd",
                     avail, total);
        goto done;
    }

    npy_intp dims[2] = {(npy_intp)sig_len, (npy_intp)n_sig};
    PyArrayObject *out =
        (PyArrayObject *)PyArray_SimpleNew(2, dims, NPY_FLOAT64);
    if (!out)
        goto done;
    double *o = (double *)PyArray_DATA(out);

    Py_BEGIN_ALLOW_THREADS
    switch (fmt) {
    case 16: {
        for (Py_ssize_t t = 0; t < sig_len; t++) {
            const uint8_t *p = buf + (size_t)(t * n_sig) * 2;
            for (Py_ssize_t s = 0; s < n_sig; s++) {
                int16_t v = (int16_t)(p[2 * s] | ((uint16_t)p[2 * s + 1] << 8));
                o[t * n_sig + s] = (v == INT16_MIN)
                    ? NAN : ((double)v - baselines[s]) / gains[s];
            }
        }
        break;
    }
    case 61: {
        /* Big-endian int16; sentinel -32768 (same as fmt 16). */
        for (Py_ssize_t t = 0; t < sig_len; t++) {
            const uint8_t *p = buf + (size_t)(t * n_sig) * 2;
            for (Py_ssize_t s = 0; s < n_sig; s++) {
                int16_t v = (int16_t)(((uint16_t)p[2 * s] << 8) | p[2 * s + 1]);
                o[t * n_sig + s] = (v == INT16_MIN)
                    ? NAN : ((double)v - baselines[s]) / gains[s];
            }
        }
        break;
    }
    case 160: {
        /* 16-bit offset binary: sample = u16le - 32768; sentinel -32768
         * (stored u16 == 0). */
        for (Py_ssize_t t = 0; t < sig_len; t++) {
            const uint8_t *p = buf + (size_t)(t * n_sig) * 2;
            for (Py_ssize_t s = 0; s < n_sig; s++) {
                int v = (int)(p[2 * s] | ((uint16_t)p[2 * s + 1] << 8)) - 32768;
                o[t * n_sig + s] = (v == -32768)
                    ? NAN : ((double)v - baselines[s]) / gains[s];
            }
        }
        break;
    }
    case 24: {
        /* Little-endian 3-byte two's complement; sentinel -8388608. */
        for (Py_ssize_t t = 0; t < sig_len; t++) {
            const uint8_t *p = buf + (size_t)(t * n_sig) * 3;
            for (Py_ssize_t s = 0; s < n_sig; s++) {
                const uint8_t *q = p + 3 * s;
                int32_t v = (int32_t)((uint32_t)q[0] | ((uint32_t)q[1] << 8) |
                                      ((uint32_t)q[2] << 16));
                if (v > 0x7FFFFF)
                    v -= 0x1000000; /* sign-extend 24-bit */
                o[t * n_sig + s] = (v == -8388608)
                    ? NAN : ((double)v - baselines[s]) / gains[s];
            }
        }
        break;
    }
    case 32: {
        for (Py_ssize_t t = 0; t < sig_len; t++) {
            const uint8_t *p = buf + (size_t)(t * n_sig) * 4;
            for (Py_ssize_t s = 0; s < n_sig; s++) {
                const uint8_t *q = p + 4 * s;
                int32_t v = (int32_t)((uint32_t)q[0] | ((uint32_t)q[1] << 8) |
                                      ((uint32_t)q[2] << 16) |
                                      ((uint32_t)q[3] << 24));
                o[t * n_sig + s] = (v == INT32_MIN)
                    ? NAN : ((double)v - baselines[s]) / gains[s];
            }
        }
        break;
    }
    case 80: {
        for (Py_ssize_t t = 0; t < sig_len; t++) {
            const uint8_t *p = buf + (size_t)(t * n_sig);
            for (Py_ssize_t s = 0; s < n_sig; s++) {
                int v = (int)p[s] - 128;
                o[t * n_sig + s] = (v == -128)
                    ? NAN : ((double)v - baselines[s]) / gains[s];
            }
        }
        break;
    }
    case 212: {
        /* 3 bytes -> 2 consecutive samples of the interleaved stream. */
        for (Py_ssize_t k = 0; k < total; k++) {
            Py_ssize_t pair = k >> 1;
            const uint8_t *p = buf + pair * 3;
            int v;
            if ((k & 1) == 0)
                v = ((p[1] & 0x0F) << 8) | p[0];
            else
                v = ((p[1] & 0xF0) << 4) | p[2];
            if (v > 2047)
                v -= 4096;
            Py_ssize_t s = k % n_sig;
            Py_ssize_t t = k / n_sig;
            o[t * n_sig + s] = (v == -2048)
                ? NAN : ((double)v - baselines[s]) / gains[s];
        }
        break;
    }
    }
    Py_END_ALLOW_THREADS

    result = (PyObject *)out;

done:
    PyMem_Free(baselines);
    PyMem_Free(gains);
    PyBuffer_Release(&raw);
    return result;
}

static PyMethodDef Methods[] = {
    {"decode_calibrate", decode_calibrate, METH_VARARGS,
     "Decode a WFDB .dat byte stream and apply baseline/gain calibration "
     "in one pass -> float64 (sig_len, n_sig)."},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_wfdbfast",
    "Native fused WFDB decode + calibration", -1, Methods};

PyMODINIT_FUNC
PyInit__wfdbfast(void)
{
    import_array();
    return PyModule_Create(&moduledef);
}
