/* Native batch assembler for the series sampler.
 *
 * The per-batch hot loop of the data pipeline (reference: the numpy
 * gather/concat in SeriesDataGenerator.generate, generators.py:529-605;
 * SURVEY.md section 3.1 "hot loops") is a strided gather:
 *
 *   out[b, t, c, :, :] = series[samples[b] + offsets[t], chan_idx[c], :, :]
 *
 * This extension implements it as parallel row memcpys over a small thread
 * pool, avoiding numpy's intermediate per-time-step arrays and the Python
 * loop. The Python sampler uses it when available (imported lazily) and
 * falls back to numpy otherwise.
 *
 * Built with plain CPython C API (no pybind11 in this environment); see
 * native/setup.py.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <numpy/arrayobject.h>
#include <pthread.h>
#include <string.h>

typedef struct {
    const float *series;     /* (N, V, H, W) contiguous */
    float *out;              /* (B, T, C, H, W) contiguous */
    const long long *samples;/* (B,) */
    const long long *offsets;/* (T,) */
    const long long *chans;  /* (C,) */
    npy_intp B, T, C, V, HW;
    npy_intp start_b, end_b; /* batch slice for this worker */
} job_t;

static void *worker(void *arg)
{
    job_t *j = (job_t *)arg;
    const npy_intp HW = j->HW;
    for (npy_intp b = j->start_b; b < j->end_b; b++) {
        for (npy_intp t = 0; t < j->T; t++) {
            const long long n = j->samples[b] + j->offsets[t];
            const float *src_base = j->series + ((npy_intp)n * j->V) * HW;
            float *dst = j->out + (((b * j->T) + t) * j->C) * HW;
            for (npy_intp c = 0; c < j->C; c++) {
                memcpy(dst + c * HW, src_base + (npy_intp)j->chans[c] * HW,
                       (size_t)HW * sizeof(float));
            }
        }
    }
    return NULL;
}

static PyObject *assemble(PyObject *self, PyObject *args)
{
    PyArrayObject *series, *samples, *offsets, *chans;
    int n_threads = 4;
    if (!PyArg_ParseTuple(args, "O!O!O!O!|i",
                          &PyArray_Type, &series,
                          &PyArray_Type, &samples,
                          &PyArray_Type, &offsets,
                          &PyArray_Type, &chans,
                          &n_threads))
        return NULL;

    if (PyArray_NDIM(series) != 4 || PyArray_TYPE(series) != NPY_FLOAT32 ||
        !PyArray_IS_C_CONTIGUOUS(series)) {
        PyErr_SetString(PyExc_ValueError,
                        "series must be contiguous float32 (N, V, H, W)");
        return NULL;
    }
    if (PyArray_TYPE(samples) != NPY_INT64 ||
        PyArray_TYPE(offsets) != NPY_INT64 ||
        PyArray_TYPE(chans) != NPY_INT64) {
        PyErr_SetString(PyExc_ValueError,
                        "samples/offsets/chans must be int64");
        return NULL;
    }

    npy_intp N = PyArray_DIM(series, 0);
    npy_intp V = PyArray_DIM(series, 1);
    npy_intp H = PyArray_DIM(series, 2);
    npy_intp W = PyArray_DIM(series, 3);
    npy_intp B = PyArray_SIZE(samples);
    npy_intp T = PyArray_SIZE(offsets);
    npy_intp C = PyArray_SIZE(chans);

    const long long *sam = (const long long *)PyArray_DATA(samples);
    const long long *off = (const long long *)PyArray_DATA(offsets);
    const long long *chn = (const long long *)PyArray_DATA(chans);
    for (npy_intp b = 0; b < B; b++)
        for (npy_intp t = 0; t < T; t++) {
            long long n = sam[b] + off[t];
            if (n < 0 || n >= N) {
                PyErr_Format(PyExc_IndexError,
                             "sample index %lld out of range [0, %ld)",
                             n, (long)N);
                return NULL;
            }
        }
    for (npy_intp c = 0; c < C; c++)
        if (chn[c] < 0 || chn[c] >= V) {
            PyErr_SetString(PyExc_IndexError, "channel index out of range");
            return NULL;
        }

    npy_intp dims[5] = {B, T, C, H, W};
    PyArrayObject *out =
        (PyArrayObject *)PyArray_SimpleNew(5, dims, NPY_FLOAT32);
    if (!out)
        return NULL;

    if (n_threads < 1)
        n_threads = 1;
    if (n_threads > 16)
        n_threads = 16;
    if (n_threads > B)
        n_threads = (int)(B > 0 ? B : 1);

    job_t jobs[16];
    pthread_t threads[16];
    npy_intp per = (B + n_threads - 1) / n_threads;

    Py_BEGIN_ALLOW_THREADS
    for (int i = 0; i < n_threads; i++) {
        jobs[i].series = (const float *)PyArray_DATA(series);
        jobs[i].out = (float *)PyArray_DATA(out);
        jobs[i].samples = sam;
        jobs[i].offsets = off;
        jobs[i].chans = chn;
        jobs[i].B = B; jobs[i].T = T; jobs[i].C = C;
        jobs[i].V = V; jobs[i].HW = H * W;
        jobs[i].start_b = i * per;
        jobs[i].end_b = (i + 1) * per < B ? (i + 1) * per : B;
        pthread_create(&threads[i], NULL, worker, &jobs[i]);
    }
    for (int i = 0; i < n_threads; i++)
        pthread_join(threads[i], NULL);
    Py_END_ALLOW_THREADS

    return (PyObject *)out;
}

static PyMethodDef methods[] = {
    {"assemble", assemble, METH_VARARGS,
     "assemble(series, samples, offsets, chan_idx, n_threads=4) -> "
     "(B, T, C, H, W) float32 gather"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_batch_assembler",
    "Threaded batch gather for the series sampler", -1, methods,
};

PyMODINIT_FUNC PyInit__batch_assembler(void)
{
    import_array();
    return PyModule_Create(&module);
}
