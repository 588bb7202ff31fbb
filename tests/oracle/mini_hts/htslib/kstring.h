#include <stdio.h>
#ifndef MINI_HTS_KSTRING_H
#define MINI_HTS_KSTRING_H
#include <stddef.h>
#include <stdlib.h>
#include <string.h>
typedef struct { size_t l, m; char *s; } kstring_t;
static int kputc(int c, kstring_t *s)
{
    if (s->l + 2 > s->m) {
        s->m = s->m ? s->m * 2 : 32;
        s->s = realloc(s->s, s->m);
    }
    s->s[s->l++] = c;
    s->s[s->l] = 0;
    return c;
}
static int kputw(int c, kstring_t *s)
{
    char buf[16];
    int n = snprintf(buf, sizeof buf, "%d", c);
    for (int i = 0; i < n; i++)
        kputc(buf[i], s);
    return 0;
}
#endif
